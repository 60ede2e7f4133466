"""Tokenizer mode contracts: JVM expressions == Arrow kernel for every mode,
and code2 identifier-splitting semantics (SURVEY §2b B1 v2)."""

from __future__ import annotations

import pytest

from geometric_aware_retrieval_v2_spark.functions.tokenizer import (
    doc_stats,
    tokenize_terms,
    tokenize_terms_arrow,
)

CASES = [
    (0, "parseHTTPServer my_var2 x"),
    (1, "XMLHttpRequest getElementById snake_case_name __dunder__"),
    (2, "simple lowercase words"),
    (3, "MixedCase123 plus 456 bare_123_number"),
    (4, "ALLCAPS Trailing_ _Leading aB"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, schema="doc_id long, content string")


def _tf(df):
    return sorted((r.doc_id, r.term, r.tf) for r in df.collect())


@pytest.mark.parametrize("mode", ["ws", "code", "code2"])
def test_jvm_equals_arrow(spark, docs, mode):
    assert _tf(tokenize_terms(docs, mode=mode)) == _tf(
        tokenize_terms_arrow(docs, mode=mode)
    )


def test_code2_splits_identifiers(spark, docs):
    got = {}
    for doc_id, term, tf in _tf(tokenize_terms(docs, mode="code2")):
        got.setdefault(doc_id, {})[term] = tf
    assert got[0] == {"parse": 1, "http": 1, "server": 1, "my": 1, "var2": 1, "x": 1}
    assert got[1]["xml"] == 1 and got[1]["http"] == 1 and got[1]["request"] == 1
    assert got[1]["get"] == 1 and got[1]["element"] == 1 and got[1]["by"] == 1
    assert got[1]["id"] == 1
    assert got[1]["snake"] == 1 and got[1]["case"] == 1 and got[1]["name"] == 1
    assert got[1]["dunder"] == 1
    # plain words unchanged vs code mode
    code = {}
    for doc_id, term, tf in _tf(tokenize_terms(docs, mode="code")):
        code.setdefault(doc_id, {})[term] = tf
    assert got[2] == code[2] == {"simple": 1, "lowercase": 1, "words": 1}
    # numbers: standalone and after '_' split out; trailing digits stay glued
    # to their subtoken (digits do not OPEN a case boundary)
    assert got[3] == {
        "mixed": 1, "case123": 1, "plus": 1, "456": 1,
        "bare": 1, "123": 1, "number": 1,
    }


def test_code2_doc_stats_counts_subtokens(spark, docs):
    dl = {r.doc_id: r.doc_len for r in doc_stats(docs, mode="code2").collect()}
    assert dl[0] == 6  # parse http server my var2 x
    assert dl[2] == 3


def test_code_mode_unchanged_by_code2_addition(spark, docs):
    """Back-compat: 'code' must NOT split identifiers (index meta records the
    mode, so existing indexes keep their semantics)."""
    code = _tf(tokenize_terms(docs, mode="code"))
    assert (0, "parsehttpserver", 1) in code
    assert (1, "snake_case_name", 1) in code
