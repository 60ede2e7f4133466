"""Deterministic synthetic source-code corpus (the north-rule input table).

Schema per BASELINE.json input_hint:
    corpus_files(repo string, path string, commit string, lang string,
                 content string)

Every value is a pure function of the row id (via splitmix64-style integer
mixing, vectorized in NumPy inside ``mapInPandas``), so the generated table is
byte-identical under any partition count — the same property the reference's
seeded synthetic loader aims for (/root/reference/geoIR/data/loaders.py:6-44)
but without RNG-call-order dependence.

Term distribution is Zipf(s=1.2) over a ~5k-identifier vocabulary so that
heavy-hitter terms exist and the posting-build salting path (SURVEY.md B3)
is actually exercised. Repo sizes are skewed the same way.

Scale stance: generation is embarrassingly parallel over ``spark.range`` —
at 10^12 files you'd generate (or, in production, scan the Iceberg table)
with the same per-row-pure contract so resume/retry never changes content.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "scala", "sql", "md"]

_KEYWORDS = (
    "def return import class self if else for while try except lambda yield "
    "public static void int long string final new extends implements "
    "val var object trait match case select from where group by order join "
    "the a and or not".split()
)


def _vocab(size: int = 5000) -> np.ndarray:
    idents = [f"ident_{i:04d}" for i in range(size - len(_KEYWORDS))]
    return np.asarray(_KEYWORDS + idents, dtype=object)


def _zipf_cdf(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    c = np.cumsum(w)
    return c / c[-1]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (public constant set)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def _u01(x: np.ndarray) -> np.ndarray:
    return (_mix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_corpus_files(
    spark: SparkSession,
    n_files: int,
    seed: int = 42,
    n_repos: int | None = None,
    vocab_size: int = 5000,
    min_tokens: int = 40,
    max_tokens: int = 600,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the corpus_files table. Content is pseudo-source-code drawn
    Zipf(1.2) from the vocabulary; 200-4000 chars typical."""
    n_repos = n_repos or max(10, n_files // 200)
    vocab = _vocab(vocab_size)
    cdf = _zipf_cdf(vocab_size)
    repo_cdf = _zipf_cdf(n_repos, s=1.1)
    seed64 = np.uint64((seed * 0xA24BAED4963EE407) % (1 << 64))

    schema = "file_id long, repo string, path string, commit string, lang string, content string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            n = len(ids)
            base = _mix64(ids + seed64)
            repo_idx = np.searchsorted(repo_cdf, _u01(base + np.uint64(1)))
            lang_idx = (_mix64(base + np.uint64(2)) % np.uint64(len(LANGS))).astype(np.int64)
            ntok = (
                min_tokens
                + (_mix64(base + np.uint64(3)) % np.uint64(max_tokens - min_tokens))
            ).astype(np.int64)
            # ragged token generation: global token coordinates (doc, j)
            offsets = np.concatenate(([0], np.cumsum(ntok)))
            total = int(offsets[-1])
            doc_of_tok = np.repeat(np.arange(n), ntok)
            j = np.arange(total, dtype=np.uint64) - offsets[doc_of_tok].astype(np.uint64)
            tok_hash = _u01(base[doc_of_tok] + np.uint64(1000) + j * np.uint64(0x9E3779B9))
            term_idx = np.searchsorted(cdf, tok_hash)
            toks = vocab[term_idx]
            contents = [
                " ".join(toks[offsets[i] : offsets[i + 1]]) for i in range(n)
            ]
            commit_hex = [f"{int(h):016x}{int(g):016x}{int(f):08x}"[:40]
                          for h, g, f in zip(_mix64(base + np.uint64(4)),
                                             _mix64(base + np.uint64(5)),
                                             _mix64(base + np.uint64(6)) >> np.uint64(32))]
            yield pd.DataFrame(
                {
                    "file_id": ids.astype(np.int64),
                    "repo": [f"org{int(r) % 37}/repo{int(r):04d}" for r in repo_idx],
                    "path": [
                        f"src/mod_{int(m) % 40:02d}/file_{int(i):08d}.{LANGS[int(l)]}"
                        for m, i, l in zip(_mix64(base + np.uint64(7)), ids, lang_idx)
                    ],
                    "commit": commit_hex,
                    "lang": [LANGS[int(l)] for l in lang_idx],
                    "content": contents,
                }
            )

    rng = spark.range(0, n_files, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=schema)


def corpus_to_docs(corpus: DataFrame) -> DataFrame:
    """corpus_files -> canonical docs frame with a stable content-addressed id.

    doc_id = xxhash64(repo, path, commit): deterministic under repartitioning
    (replaces the reference's positional List index, index.py:97-101);
    content_sha256 is the per-row invariant required by BASELINE.json.
    """
    return corpus.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )
