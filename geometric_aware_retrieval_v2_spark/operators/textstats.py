"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token statistics, rolling-hash fingerprinting.

All pure JVM expressions (whole-stage codegen), all deterministic, all
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_DECIMALS = 6

# tiny per-language stopword lexicons (public-knowledge n-gram/stopword
# heuristic; the point is the operator shape, not linguistic accuracy)
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _tokens(content_col: str):
    return F.filter(F.split(F.lower(F.col(content_col)), r"\s+"), lambda x: x != "")


def lang_id(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """-> (doc_id, lang_pred, lang_hits): argmax of lexicon hit counts,
    ties broken by language code order; 'und' when no lexicon hits."""
    toks = _tokens(content_col)
    counts = [
        F.size(F.filter(toks, lambda x: x.isin(LANG_LEXICONS[lang]))).alias(f"c_{lang}")
        for lang in sorted(LANG_LEXICONS)
    ]
    scored = docs.select("doc_id", *counts)
    langs = sorted(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"c_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first language reaching the max wins (code order)
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.cast("long").alias("lang_hits")
    )


def quality_score(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """-> (doc_id, n_tokens, stopword_ratio, mean_token_len, quality):
    length/stopword/word-shape heuristics blended into one score in [0,1]."""
    toks = _tokens(content_col)
    all_stops = sorted({w for ws in LANG_LEXICONS.values() for w in ws})
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(all_stops))) / F.greatest(
        F.lit(1), n
    )
    mean_len = (F.length(F.col(content_col)) - (n - 1)) / F.greatest(F.lit(1), n)
    length_term = F.least(F.lit(1.0), n / F.lit(100.0))
    stop_term = F.lit(1.0) - F.least(F.lit(1.0), stop_ratio * 5)
    shape_term = F.when((mean_len >= 3) & (mean_len <= 12), 1.0).otherwise(0.5)
    quality = (length_term + stop_term + shape_term) / 3
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, OUT_DECIMALS).alias("stopword_ratio"),
        F.round(mean_len, OUT_DECIMALS).alias("mean_token_len"),
        F.round(quality, OUT_DECIMALS).alias("quality"),
    )


def token_stats(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """-> (doc_id, n_tokens, n_distinct, type_token_ratio)."""
    toks = _tokens(content_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        F.round(nd / F.greatest(F.lit(1), n), OUT_DECIMALS).alias("type_token_ratio"),
    )


FP_MOD = 2_147_483_647  # 2^31 - 1: keeps acc*131 + tok within int64 (ANSI-safe)
FP_BASE = 131


def doc_fingerprint(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """-> (doc_id, fingerprint): polynomial rolling hash over the token
    sequence, h = fold(h * B + md5_60(tok) mod p). Order-sensitive (unlike
    the shingle/minhash family) — detects exact token-sequence duplicates."""
    toks = _tokens(content_col)
    tokval = lambda x: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long"), F.lit(FP_MOD)
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * FP_BASE + tokval(x), F.lit(FP_MOD)),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
