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


@pytest.mark.parametrize("mode", ["ws", "code", "code2"])
def test_byte_kernel_fuzz(spark, mode):
    """The byte-mask tokenizer (functions.tokenizer._byte_token_spans) must
    reproduce the JVM expressions on adversarial content: digit/ident
    interleavings (the [0-9]+ alternative), camel chains and acronym runs
    (both boundary patterns, including their sequential non-overlap
    semantics), underscores, unicode whitespace and multi-byte characters
    (byte-level classification must treat them as separators), empty and
    null docs, and 300 random strings over a mixed alphabet."""
    import random

    rng = random.Random(42)
    alpha = (
        "ab XY Zz 09_ \t\n\x0b\f\r\xa0 é漢9A aB0_C"
        "  HTTPServer2 __9 x"
    )
    cases = [
        "9abc", "abc9", "9_a", "_9a", "a9B", "9A9b", "12ab3cd", "999",
        "A", "aA", "AAa", "ABcDEf", "aAaA", "HTTPServerAPIClient",
        "HTTP2Server", "var2Name", "_", "__", "", " ", "\xa0", "é",
        "漢字 テスト", "a\xa0b", "mixedCASE_and_123numbers",
        "X" * 300, ("aB" * 200), ("9z" * 150),
    ]
    for _ in range(300):
        n = rng.randint(0, 60)
        cases.append("".join(rng.choice(alpha) for _ in range(n)))
    rows = [(i, c) for i, c in enumerate(cases)] + [(len(cases), None)]
    docs = spark.createDataFrame(rows, schema="doc_id long, content string")
    jvm = sorted(
        (r.doc_id, r.term, r.tf)
        for r in tokenize_terms(docs, mode=mode).collect()
    )
    arrow = sorted(
        (r.doc_id, r.term, r.tf)
        for r in tokenize_terms_arrow(docs, mode=mode).collect()
    )
    assert jvm == arrow


def test_code_mode_unchanged_by_code2_addition(spark, docs):
    """Back-compat: 'code' must NOT split identifiers (index meta records the
    mode, so existing indexes keep their semantics)."""
    code = _tf(tokenize_terms(docs, mode="code"))
    assert (0, "parsehttpserver", 1) in code
    assert (1, "snake_case_name", 1) in code
