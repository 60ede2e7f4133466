"""Tokenization: content -> (doc_id, term, tf) triples + per-doc stats.

Two implementations with identical output (tests assert agreement):

1. ``tokenize_terms`` — pure JVM expressions (``split``/``regexp_extract_all``
   -> ``explode`` -> hash aggregate). Whole-stage-codegen'd end to end; this
   is the default and the 100 TB path: no Python in the loop at all, and the
   map-side partial aggregation of (doc_id, term) counts happens before the
   shuffle.
2. ``tokenize_terms_arrow`` — ``mapInPandas`` emitting the triples directly
   from Arrow batches (the BASELINE.json "vectorized pandas/Arrow UDF
   tokenization" formulation; also where code-aware extras like camelCase
   splitting would live). Avoids exploding giant arrays through the row
   format by counting within the batch.

Tokenizer modes:
  * ``ws``    — whitespace terms (matches the oracle SQL ``string_split``).
  * ``code``  — identifier/number tokens ``[A-Za-z_][A-Za-z0-9_]*|[0-9]+``,
    lowercased, for the source-code corpus.
  * ``code2`` — ``code`` plus identifier splitting (SURVEY §2b B1's v2):
    camelCase boundaries (``parseHTTPServer`` -> parse http server) and
    snake_case underscores (``my_var2`` -> my var2) become token breaks
    BEFORE extraction. Pure JVM regexp_replace chain — still zero Python in
    the hot path — and bit-reproducible in the DuckDB oracle with the same
    two boundary patterns.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CODE_TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+"
# lower/digit->Upper boundary, then ACRONYMWord ("HTTPServer" -> "HTTP Server")
CAMEL_BOUNDARY_1 = r"([a-z0-9])([A-Z])"
CAMEL_BOUNDARY_2 = r"([A-Z]+)([A-Z][a-z])"

TOKENIZER_MODES = ("ws", "code", "code2")

# ---- driver-side twin of _terms_col (see py_terms) --------------------------
# Java's \s without UNICODE_CHARACTER_CLASS is exactly [ \t\n\x0B\f\r] — the
# ASCII set. Python's \s is the Unicode set (adds \x1c-\x1f, \x85, \xa0, …),
# so the twin spells the Java class out instead of using \s.
_JAVA_WS_RE = re.compile("[ \t\n\x0b\f\r]+")
_CODE_RE = re.compile(CODE_TOKEN_RE)
_CB1_RE = re.compile(CAMEL_BOUNDARY_1)
_CB2_RE = re.compile(CAMEL_BOUNDARY_2)


def py_terms(text: str | None, mode: str) -> list[str]:
    """Driver-side twin of ``_terms_col`` for the interactive query probe
    (operators/index._interactive_trip): identical token list, zero Catalyst
    work. Exactness argument, per mode:

    * ``ws`` — ``F.split(col, r"\\s+")`` is Java ``Pattern.split`` with the
      ASCII ``\\s`` class (spelled out above); empty strings are filtered the
      same way.
    * ``code``/``code2`` — every class in CODE_TOKEN_RE and the camel
      boundary patterns is pure ASCII, where Java and Python regex semantics
      coincide (leftmost, greedy, non-overlapping); extraction therefore
      yields ASCII-only tokens, on which JVM ``lower`` == ``str.lower``.

    Pinned by test_tokenizer.py's py-vs-JVM fuzz (unicode whitespace, camel
    chains, empty/None) — the twin may only ship while that agreement holds.
    """
    if text is None:
        return []
    if mode == "ws":
        return [t for t in _JAVA_WS_RE.split(text) if t != ""]
    if mode in ("code", "code2"):
        s = text
        if mode == "code2":
            s = _CB1_RE.sub(r"\1 \2", s)
            s = _CB2_RE.sub(r"\1 \2", s)
            s = s.replace("_", " ")
        return [m.lower() for m in _CODE_RE.findall(s)]
    raise ValueError(f"unknown tokenizer mode: {mode}")


def boundary_split_col(content: Column) -> Column:
    """Insert spaces at camelCase boundaries and replace underscores, so the
    plain ``code`` extraction then yields subtokens."""
    c = F.regexp_replace(content, CAMEL_BOUNDARY_1, r"$1 $2")
    c = F.regexp_replace(c, CAMEL_BOUNDARY_2, r"$1 $2")
    return F.regexp_replace(c, "_", " ")


def _terms_col(content_col: str, mode: str):
    if mode == "ws":
        return F.filter(F.split(F.col(content_col), r"\s+"), lambda x: x != "")
    if mode in ("code", "code2"):
        src = F.col(content_col)
        if mode == "code2":
            src = boundary_split_col(src)
        return F.transform(
            F.regexp_extract_all(src, F.lit(CODE_TOKEN_RE), 0),
            lambda x: F.lower(x),
        )
    raise ValueError(f"unknown tokenizer mode: {mode}")


def tokenize_terms(docs: DataFrame, content_col: str = "content", mode: str = "ws") -> DataFrame:
    """docs -> (doc_id, term, tf). JVM-only: codegen'd split/explode, then a
    hash aggregate whose partial (map-side) phase combines before the shuffle
    on doc_id+term."""
    return (
        docs.select("doc_id", F.explode(_terms_col(content_col, mode)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tokenize_terms_arrow(
    docs: DataFrame, content_col: str = "content", mode: str = "ws"
) -> DataFrame:
    """Arrow-batched tokenizer: same (doc_id, term, tf) contract, produced by
    vectorized pandas string ops inside ``mapInPandas`` (no per-row Python UDF
    calls; one Python invocation per Arrow batch)."""
    import re

    if mode not in TOKENIZER_MODES:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    pat = re.compile(CODE_TOKEN_RE) if mode in ("code", "code2") else None
    split_idents = mode == "code2"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pat is None:
                toks = pdf[content_col].str.split()
            else:
                s = pdf[content_col]
                if split_idents:
                    s = (
                        s.str.replace(CAMEL_BOUNDARY_1, r"\1 \2", regex=True)
                        .str.replace(CAMEL_BOUNDARY_2, r"\1 \2", regex=True)
                        .str.replace("_", " ", regex=False)
                    )
                toks = s.str.lower().str.findall(pat)
            flat = pd.DataFrame(
                {"doc_id": pdf["doc_id"].repeat(toks.str.len()).to_numpy(),
                 "term": [t for lst in toks for t in lst]}
            )
            if flat.empty:
                yield pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                    "term": pd.Series(dtype="object"),
                                    "tf": pd.Series(dtype="int64")})
                continue
            out = flat.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
            yield out

    # a document's content is ONE input row, so batch-local (doc_id, term)
    # counts are already final — no shuffle, no second aggregate: this is a
    # purely narrow operator
    return docs.select("doc_id", content_col).mapInPandas(
        run, schema="doc_id long, term string, tf long"
    )


def doc_stats(docs: DataFrame, content_col: str = "content", mode: str = "ws") -> DataFrame:
    """Per-doc projection: doc_len (token count) + content_sha256 (the per-row
    pipeline invariant, BASELINE.json). Pure JVM expressions."""
    return docs.select(
        "doc_id",
        F.size(_terms_col(content_col, mode)).cast("long").alias("doc_len"),
        F.sha2(F.col(content_col), 256).alias("content_sha256"),
    )
