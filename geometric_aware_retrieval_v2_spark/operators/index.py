"""Inverted-index lifecycle: resumable segmented build -> distributed merge ->
block-max WAND / exhaustive BM25 query over the compressed index.

Layout (parquet-as-Iceberg, see plans/manifest.py):
    index_dir/
      meta.json        n_docs, avgdl, n_shards, block_size, tokenizer_mode
      docstats/part=I/ (doc_id, doc_len, content_sha256) per build partition
      segments/part=I/ posting block rows per build partition
      postings/        merged consolidated block rows
      dictionary/      (term_id, df) — derived from block metadata only
      manifest/        per-partition lineage + metrics

Build is checkpoint-resumable: build partitions are ``pmod(xxhash64(doc_id),
P)`` (content-addressed, so a resume after kill processes exactly the missing
partitions and produces byte-identical segments — verified by tests). Each
partition's job is an independent Spark action, which is how a spark-submit
driver on a 1000-executor cluster would chunk a 10^12-file build; partition
granularity P scales with input size while each job stays shuffle-light.

Query topology: postings are document-sharded (see operators/postings.py), so
scoring is per-(qid, shard) partial top-k inside a grouped Arrow UDF (batched
NumPy; no per-row Python) followed by a final per-qid top-k window — partials
are exact because a document's every query term lives in its one shard.

Block-max WAND (Ding & Suel, SIGIR 2011), adapted to a vectorized two-pass
form that is *provably exact* (see _score_group): phase 1 decodes the few
highest-upper-bound blocks to establish a score floor theta (a lower bound on
the true k-th best score); phase 2 skips every block whose own upper bound
plus the overlapping upper bounds of the other query terms cannot reach
theta. Any document whose true score >= theta has all of its blocks survive,
hence is scored exactly; all others cannot be in the top-k.
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark import localrel
from geometric_aware_retrieval_v2_spark.functions.tokenizer import (
    _terms_col,
    py_terms,
    tokenize_terms_arrow,
)
from geometric_aware_retrieval_v2_spark.functions.xxh64 import xxh64_str
from geometric_aware_retrieval_v2_spark.operators.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    SCORE_DECIMALS,
    query_terms,
)
from geometric_aware_retrieval_v2_spark.operators.ordinals import assign_ordinals
from geometric_aware_retrieval_v2_spark.operators.postings import (
    decode_block,
    merge_segments,
    pack_postings,
    pack_width,
)
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk
from geometric_aware_retrieval_v2_spark.plans import manifest as mf


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    n_shards: int
    block_size: int
    tokenizer_mode: str

    def save(self, index_dir: str) -> None:
        # pyarrow.fs routing (scheme dispatch like the manifest layer):
        # meta.json works on local, file://, and remote filesystems alike;
        # staged-tmp + rename so a crash mid-write cannot leave a torn
        # meta.json that breaks every subsequent load/search/compact
        mf.fs_write_bytes_atomic(
            index_dir.rstrip("/") + "/meta.json",
            json.dumps(self.__dict__).encode(),
        )

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        # every query/compact path loads meta first, so this is the natural
        # point to replay a crashed compact swap (see manifest.recover_swap)
        mf.recover_swap(index_dir)
        return IndexMeta(
            **json.loads(mf.fs_read_bytes(index_dir.rstrip("/") + "/meta.json"))
        )


def _check_vocab(n_terms: int, n_term_ids: int) -> None:
    """Build-time integrity gate on the 8-byte term_id keying: an xxhash64
    collision silently merges two terms' posting lists and inflates df/BM25
    for both, so the merge stage fails the build instead. (Widening to a
    two-hash-column key is the design escape hatch if a real corpus ever
    trips this — odds ~v^2/2^65; see operators/postings.py.)"""
    if n_terms != n_term_ids:
        raise RuntimeError(
            f"term_id hash collision detected: {n_terms} distinct terms map to "
            f"{n_term_ids} distinct term_ids. Rebuild with a widened term key."
        )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_partitions: int = 8,
    n_shards: int = 8,
    block_size: int = 128,
    tokenizer_mode: str = "ws",
    run_id: str = "run-0",
    verify_vocab: bool = True,
    docmap_broadcast_max_rows: int = 8_000_000,
) -> IndexMeta:
    """Resumable build. ``docs`` must have (doc_id, content).

    Stages (each manifest-committed, resume skips completed ones):
      params       build parameters pinned (resume with different parameters
                   RAISES: completed docstats/ingest/segments artifacts are
                   keyed by pmod(xxhash64(doc_id), n_partitions), so resuming
                   under a different partitioning would silently drop or
                   duplicate documents)
      docstats[p]  per-partition doc_len + content_sha256
      docmap       dense ordinal assignment over all docstats (ordinals.py)
      segments[p]  tokenized triples joined to ordinals, packed into blocks
      merge        consolidated postings + dictionary + meta (+ vocab
                   integrity gate, see _check_vocab)
    """
    from geometric_aware_retrieval_v2_spark.config import IndexConfig

    IndexConfig(  # the reference's validation contract gates the entry point
        n_partitions=n_partitions,
        n_shards=n_shards,
        block_size=block_size,
        tokenizer_mode=tokenizer_mode,
    )
    mf.fs_mkdirs(index_dir)

    params_fp = json.dumps(
        {
            "n_partitions": n_partitions,
            "n_shards": n_shards,
            "block_size": block_size,
            "tokenizer_mode": tokenizer_mode,
        },
        sort_keys=True,
    )
    committed_params = mf.completed_partitions(spark, index_dir, "params")
    if -1 in committed_params:
        fps = mf.stage_fingerprints(spark, index_dir, "params")
        if len(fps) > 1:
            raise RuntimeError(
                f"index_dir {index_dir} manifest holds {len(fps)} conflicting "
                f"'params' rows {sorted(fps)} — a prior resume ran against a "
                "manifest it could not read. The partition-keyed artifacts "
                "cannot be trusted; delete the index_dir and rebuild."
            )
        if committed_params[-1] != params_fp:
            raise ValueError(
                f"index_dir {index_dir} holds a build started with parameters "
                f"{committed_params[-1]}; resuming with {params_fp} would corrupt "
                "the partition-keyed artifacts. Delete the index_dir or match "
                "the original parameters."
            )
    else:
        mf.append_manifest(
            spark, index_dir,
            [mf.manifest_row(run_id, "params", -1, params_fp, 0, 0, 0, index_dir)],
        )
    docs = docs.select("doc_id", "content").withColumn(
        "bp", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int")
    )

    # bp is a COMPUTED column, so each per-partition job's filter(bp == p)
    # re-scans the whole source — O(P x corpus) scans. Above a small P,
    # materialize the input once partitionBy(bp) (a resumable, manifest-
    # committed ingest stage): every job then reads only its directory
    # (partition pruning), turning 2P full scans into 1 write + 2P pruned
    # reads. Below the threshold the duplicate scan is cheaper than the
    # extra write.
    if n_partitions > 8:
        inp = f"{index_dir}/input"
        if -1 not in mf.completed_partitions(spark, index_dir, "ingest"):
            t0 = time.monotonic()
            docs.write.partitionBy("bp").mode("overwrite").parquet(inp)
            mf.append_manifest(
                spark, index_dir,
                [mf.manifest_row(run_id, "ingest", -1, "source", 0, 0,
                                 int((time.monotonic() - t0) * 1000), inp)],
            )
        docs = spark.read.parquet(inp)

    # per-partition jobs are submitted CONCURRENTLY (Spark schedules many
    # jobs in one session); each still commits its own manifest row, so
    # resume granularity is unchanged while driver-side job latencies overlap
    manifest_lock = threading.Lock()

    def _commit(stage: str, p: int, fp: str, rows: int, wall_ms: int, out: str) -> None:
        with manifest_lock:
            mf.append_manifest(
                spark, index_dir,
                [mf.manifest_row(run_id, stage, p, fp, rows, 0, wall_ms, out)],
            )

    def _docstats_job(p: int) -> None:
        t0 = time.monotonic()
        part = docs.filter(F.col("bp") == p).drop("bp")
        # tokenize ONCE (narrow Arrow pass), store the tf projection; doc_len
        # falls out of it — content is never re-scanned by a regex again.
        # (A fused kernel emitting tf rows + per-doc (doc_len, sha256) rows
        # from one pass was A/B-tested this round and LOST in the warm state
        # the bench runs in: the extra Python work — hashlib, concat, the
        # dynamic-partition sort — costs ~2 s/partition more than the two
        # warm JVM scans it saves. Guide §1.1: empirical loop beat the
        # first-principles "one pass" plan; see OPTIMIZATION_r06.md.)
        tf_path = f"{index_dir}/tf/part={p}"
        # term_id is precomputed here (cheap JVM projection riding the same
        # write job): the segments stage then scans the dict-encodable int64
        # column and skips both the term-string column read and the hash —
        # only the vocab-gate's distinct still touches the strings
        tokenize_terms_arrow(part, mode=tokenizer_mode).withColumn(
            "term_id", F.xxhash64("term")
        ).write.mode("overwrite").parquet(tf_path)
        tf_stored = spark.read.parquet(tf_path)
        dl = tf_stored.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
        out = f"{index_dir}/docstats/part={p}"
        # the input fingerprint rides the write job as an Observation —
        # no separate post-write aggregation job per partition
        obs = Observation(f"docstats-fp-{p}")
        (
            part.select("doc_id", F.sha2("content", 256).alias("content_sha256"))
            .join(dl, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("doc_len", F.lit(0)).alias("doc_len"),
                "content_sha256",
            )
            .observe(
                obs,
                # decimal(38,0) accumulation: overflow-free under ANSI mode
                F.sum(F.xxhash64("doc_id", "content_sha256").cast("decimal(38,0)")).alias("fp"),
                F.count(F.lit(1)).alias("rows"),
            )
            .write.mode("overwrite")
            .parquet(out)
        )
        got = obs.get
        _commit("docstats", p, str(got["fp"]), int(got["rows"]),
                int((time.monotonic() - t0) * 1000), out)

    done = mf.completed_partitions(spark, index_dir, "docstats")
    todo = [p for p in range(n_partitions) if p not in done]
    if todo:
        with ThreadPoolExecutor(max_workers=min(4, len(todo))) as ex:
            list(ex.map(_docstats_job, todo))

    if -1 not in mf.completed_partitions(spark, index_dir, "docmap"):
        t0 = time.monotonic()
        dstats = spark.read.parquet(f"{index_dir}/docstats")
        # docmap carries dl so segment jobs join ONE small table, not two;
        # the exact doc count is free from the docstats manifest commits, so
        # the ordinal sampler skips its counting job
        docmap = assign_ordinals(
            dstats, n_ranges=max(n_partitions, 8),
            n_rows=mf.stage_rows_total(spark, index_dir, "docstats"),
        ).join(
            dstats.select("doc_id", F.col("doc_len").alias("dl")), "doc_id"
        )
        docmap.write.mode("overwrite").parquet(f"{index_dir}/docmap")
        mf.append_manifest(
            spark,
            index_dir,
            [
                mf.manifest_row(
                    run_id, "docmap", -1, "all-docstats", 0, 0,
                    int((time.monotonic() - t0) * 1000), f"{index_dir}/docmap",
                )
            ],
        )

    # cached once: every segment job broadcasts this table, and without the
    # cache each job re-scans the docmap parquet to build its broadcast
    dl_by_ord = (
        spark.read.parquet(f"{index_dir}/docmap").select("doc_id", "ord", "dl").cache()
    )
    # join-strategy switch: the docmap is corpus-proportional, so a hardwired
    # F.broadcast would collect 10^12 rows to the driver at the target scale
    # (the same defect class pack_width fixed for the pack shuffle). The doc
    # count is free from the docstats manifest commits — no counting job.
    # Below the cap (~8M rows ≈ a few hundred MB relation) the broadcast
    # skips shuffling the much larger tf fan-out; above it the join runs as
    # a plain shuffle join (AQE picks the physical strategy).
    n_docs_total = mf.stage_rows_total(spark, index_dir, "docstats")
    broadcast_docmap = n_docs_total <= docmap_broadcast_max_rows

    def _segments_job(p: int) -> None:
        t0 = time.monotonic()
        # scan only (doc_id, term_id, tf): term_id was precomputed at tf
        # write time, so the term STRING column is never read here. A tf
        # partition committed by a PRE-upgrade build (resume) lacks the
        # column — hash inline for exactly those (same xxhash64, same bits)
        tf = spark.read.parquet(f"{index_dir}/tf/part={p}")
        if "term_id" not in tf.columns:
            tf = tf.withColumn("term_id", F.xxhash64("term"))
        tf = tf.select("doc_id", "term_id", "tf")
        # postings are keyed by dense ordinal from here on; shard is a pure
        # function of the ordinal so partial top-k per shard stays exact.
        # docmap join strategy chosen above from the committed doc count:
        # broadcast below docmap_broadcast_max_rows, shuffle join past it
        tf_ord = (
            tf.join(F.broadcast(dl_by_ord) if broadcast_docmap else dl_by_ord,
                    "doc_id")
            .select(
                F.col("ord").alias("doc_id"),
                # postings stay keyed by the 8-byte term hash; the string
                # never enters the pack shuffle/sort/parquet (pack_postings)
                "term_id",
                # tf and dl always fit int32 (dl = per-doc token count);
                # narrowing them halves their share of the pack shuffle
                # (guide §2.3 "narrower types") — the pack kernel upcasts
                # to uint64 on arrival, so block bytes are bit-identical
                # (pinned by test_pack_narrowed_types_identical)
                F.col("tf").cast("int").alias("tf"),
                F.col("dl").cast("int").alias("dl"),
                F.pmod(F.col("ord"), F.lit(n_shards)).cast("int").alias("shard"),
            )
        )
        # pack shuffle width sized from the DATA: sum(doc_len) over this
        # partition's docstats (a tiny columnar agg on an already-written
        # table) is a free upper bound on posting rows — bounds the pack
        # kernel's per-task pandas buffer at any corpus size, where the
        # session-default width would buffer corpus/width rows per task
        dl_sum = (
            spark.read.parquet(f"{index_dir}/docstats/part={p}")
            .agg(F.sum("doc_len"))
            .collect()[0][0]
            or 0
        )
        width = pack_width(int(dl_sum), spark.sparkContext.defaultParallelism)
        seg = pack_postings(tf_ord, n_shards=n_shards, block_size=block_size, n_tasks=width)
        seg_path = f"{index_dir}/segments/part={p}"
        seg.write.mode("overwrite").parquet(seg_path)
        n_bytes = mf.fs_dir_bytes(seg_path)
        with manifest_lock:
            mf.append_manifest(
                spark,
                index_dir,
                [
                    mf.manifest_row(
                        run_id, "segments", p, "tokenize+pack", 0,
                        int(n_bytes), int((time.monotonic() - t0) * 1000), seg_path,
                    )
                ],
            )

    done = mf.completed_partitions(spark, index_dir, "segments")
    todo = [p for p in range(n_partitions) if p not in done]
    if todo:
        with ThreadPoolExecutor(max_workers=min(4, len(todo))) as ex:
            list(ex.map(_segments_job, todo))
    dl_by_ord.unpersist()

    if -1 not in mf.completed_partitions(spark, index_dir, "merge"):
        t0 = time.monotonic()
        segments = spark.read.parquet(f"{index_dir}/segments")
        # logical merge (cross-segment blocks are doc-disjoint, see
        # merge_segments) until fragmentation matters; physical compaction
        # kicks in automatically at high partition counts
        merged = merge_segments(
            segments,
            n_shards=n_shards,
            block_size=block_size,
            compact=n_partitions > 32,
        )

        # the four merge products are mutually independent, so their jobs run
        # CONCURRENTLY (Amdahl residue: serializing them costs fixed driver/
        # scheduling seconds that do not shrink with cluster size). The
        # dictionary derives from the SEGMENTS metadata — the merge is a 1:1
        # repartition of the same block rows (compact=True repack also
        # preserves per-term posting counts), so sum(n) per term_id is
        # identical to deriving it from the written postings.
        def _write_postings() -> None:
            merged.write.mode("overwrite").parquet(f"{index_dir}/postings")

        def _write_dictionary() -> None:
            segments.groupBy("term_id").agg(F.sum("n").alias("df")).write.mode(
                "overwrite"
            ).parquet(f"{index_dir}/dictionary")

        def _vocab_n_terms() -> int:
            # the tf projection still carries the term STRINGS (postings
            # dropped them at segment time), so the collision gate is one
            # distinct-count over tf vs the dictionary's term_id count
            return (
                spark.read.parquet(f"{index_dir}/tf").select("term").distinct().count()
            )

        def _corpus_stats():
            return (
                spark.read.parquet(f"{index_dir}/docstats")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.avg(F.col("doc_len").cast("double")).alias("a"),
                )
                .collect()[0]
            )

        with ThreadPoolExecutor(max_workers=4) as ex:
            f_post = ex.submit(_write_postings)
            f_dict = ex.submit(_write_dictionary)
            f_vocab = ex.submit(_vocab_n_terms) if verify_vocab else None
            f_stats = ex.submit(_corpus_stats)
            f_post.result()
            f_dict.result()
            stats = f_stats.result()
            if f_vocab is not None:
                _check_vocab(
                    f_vocab.result(), spark.read.parquet(f"{index_dir}/dictionary").count()
                )
        IndexMeta(int(stats.n), float(stats.a), n_shards, block_size, tokenizer_mode).save(index_dir)
        mf.append_manifest(
            spark,
            index_dir,
            [
                mf.manifest_row(
                    run_id, "merge", -1, "all-segments", 0, 0,
                    int((time.monotonic() - t0) * 1000), f"{index_dir}/postings",
                )
            ],
        )
    return IndexMeta.load(index_dir)


# ----------------------------------------------------------------- query path


def _wand_survival(
    terms: np.ndarray,
    first: np.ndarray,
    last: np.ndarray,
    ub: np.ndarray,
    theta: float,
) -> np.ndarray:
    """Vectorized WAND phase-2 survival test: keep[i] iff an upper bound on
    any doc in block i's achievable score reaches theta.

    bound[i] = ub[i] + sum over OTHER query terms t of (an upper bound on)
    max{ub[j] : j is a block of t whose doc interval overlaps block i's}.

    Per term t, blocks sorted by first_doc: every truly-overlapping j lies in
    [lo, hi) where hi = |{first_j <= last_i}| (sorted prefix) and lo = first
    index with cummax(last)[j] >= first_i. Within one segment a term's block
    intervals are disjoint and sorted, so cummax(last) == last and [lo, hi)
    is EXACTLY the overlap set; across logically-merged segments ranges may
    interleave and [lo, hi) is a superset — max over a superset is still a
    valid upper bound, so exactness is preserved (pruning loosens only where
    a long early block spans past later ones). Range-max over [lo, hi) uses
    a per-term sparse table: O(nb log nb) NumPy total, no per-block Python
    (replaces the O(nb x terms x blocks_per_term) loop flagged at 100x
    scale in round 2).
    """
    nb = len(ub)
    bound = ub.astype(np.float64, copy=True)
    order = np.lexsort((first, terms))
    ts = terms[order]
    tstart = np.nonzero(np.r_[True, ts[1:] != ts[:-1]])[0]
    tend = np.r_[tstart[1:], nb]
    for s, e in zip(tstart, tend):  # one iteration per QUERY TERM (tiny)
        idx = order[s:e]
        f_t = first[idx]
        u_t = ub[idx]
        cml = np.maximum.accumulate(last[idx])
        nt = e - s
        # sparse table: tabs[k][j] = max(u_t[j : j + 2^k])
        tabs = [u_t]
        k = 0
        while (1 << (k + 1)) <= nt:
            half = 1 << k
            tabs.append(np.maximum(tabs[k][:-half], tabs[k][half:]))
            k += 1
        q = np.nonzero(terms != ts[s])[0]
        if len(q) == 0:
            continue
        hi = np.searchsorted(f_t, last[q], side="right")
        lo = np.searchsorted(cml, first[q], side="left")
        valid = hi > lo
        if not valid.any():
            continue
        lov, hiv = lo[valid], hi[valid]
        lev = np.log2((hiv - lov).astype(np.float64)).astype(np.int64)
        contrib = np.empty(len(lov))
        for lv in np.unique(lev):  # <= log2(nt) gather passes
            m = lev == lv
            half = 1 << int(lv)
            contrib[m] = np.maximum(tabs[lv][lov[m]], tabs[lv][hiv[m] - half])
        upd = np.zeros(len(q))
        upd[valid] = contrib
        bound[q] += upd
    return bound >= theta


def _score_blocks(
    idf: np.ndarray,
    mtf: np.ndarray,
    mdl: np.ndarray,
    first: np.ndarray,
    last: np.ndarray,
    terms: np.ndarray,
    ns: np.ndarray,
    get_bytes,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    use_wand: bool,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Score one (qid, shard) group of block rows given as plain NumPy
    columns plus a ``get_bytes(i) -> bytes`` accessor. -> (doc_ids, scores,
    n_blocks, n_decoded). Batched NumPy only — shared by the pandas grouped
    kernel (distributed tail) and the no-shuffle interactive kernel, so the
    two paths are score-identical by construction."""
    nb = len(terms)
    ub = idf * (mtf * (k1 + 1.0) / (mtf + k1 * (1.0 - b + b * mdl / avgdl)))

    cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode(i: int) -> tuple[np.ndarray, np.ndarray]:
        if i not in cache:
            d, t, l = decode_block(get_bytes(i), int(ns[i]))
            tf = t.astype(np.float64)
            dl = l.astype(np.float64)
            s = idf[i] * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            cache[i] = (d, s)
        return cache[i]

    keep = np.ones(nb, dtype=bool)
    if use_wand and nb > 2:
        # phase 1: decode a few highest-ub blocks -> theta (lower bound on
        # the true kth-best score: partial sums are <= true scores). The
        # probe set is the global top few PLUS the single highest-ub block
        # of EVERY query term: multi-term queries otherwise establish theta
        # from one hot term only, so the floor misses the cross-term score
        # mass and phase 2 keeps nearly everything
        order = np.argsort(-ub, kind="mergesort")
        probe = order[: max(2, min(nb, 2 * max(k // 8, 1) + 2))]
        _, first_idx = np.unique(terms[order], return_index=True)
        probe = np.unique(np.concatenate([probe, order[first_idx]]))
        pd_docs = np.concatenate([decode(int(i))[0] for i in probe])
        pd_scores = np.concatenate([decode(int(i))[1] for i in probe])
        uniq, inv = np.unique(pd_docs, return_inverse=True)
        acc = np.zeros(len(uniq))
        np.add.at(acc, inv, pd_scores)
        theta = np.partition(acc, len(acc) - k)[len(acc) - k] if len(acc) >= k else -np.inf
        if np.isfinite(theta):
            # phase 2: vectorized per-block survival test (see _wand_survival)
            keep = _wand_survival(terms, first, last, ub, theta)
            keep[probe] = True  # already decoded; keep their contributions

    dec = [decode(int(i)) for i in np.nonzero(keep)[0]]
    if not dec:
        return np.empty(0, np.int64), np.empty(0, np.float64), nb, len(cache)
    docs = np.concatenate([d for d, _ in dec])
    scores = np.concatenate([s for _, s in dec])
    uniq, inv = np.unique(docs, return_inverse=True)
    acc = np.zeros(len(uniq))
    np.add.at(acc, inv, scores)
    # partial top-k within the shard on the SAME key as the final merge:
    # (half-up-rounded score desc, doc_id asc) — otherwise a near-tie doc cut
    # here by raw score could out-rank a kept one after rounding upstream
    acc_r = np.floor(acc * 10.0**SCORE_DECIMALS + 0.5) / 10.0**SCORE_DECIMALS
    sel = np.lexsort((uniq, -acc_r))[:k]
    return uniq[sel], acc_r[sel], nb, len(cache)


def _score_group_kernel(
    pdf: pd.DataFrame,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    use_wand: bool,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """pandas adapter over ``_score_blocks`` (the grouped distributed tail)."""
    byte_col = pdf["bytes"]
    return _score_blocks(
        pdf["idf"].to_numpy(dtype=np.float64),
        pdf["max_tf"].to_numpy(dtype=np.float64),
        pdf["min_dl"].to_numpy(dtype=np.float64),
        pdf["first_doc"].to_numpy(dtype=np.int64),
        pdf["last_doc"].to_numpy(dtype=np.int64),
        pdf["term_id"].to_numpy(dtype=np.int64),
        pdf["n"].to_numpy(dtype=np.int64),
        lambda i: byte_col.iat[i],
        k=k, k1=k1, b=b, avgdl=avgdl, use_wand=use_wand,
    )


def _shard_partition_salt(
    spark: SparkSession, n_shards: int, n_parts: int, max_salt: int = 4096
) -> int:
    """Find a salt c so that ``repartition(n_parts, (shard + c) AS INT)``
    spreads the shard values over the most distinct partitions (perfect
    spread when one exists in budget). HashPartitioning applies the same
    Murmur3 ``hash()`` SQL exposes, so the bucket of every (c, shard) pair
    is evaluated driver-side in ONE LocalRelation fold — no job. For large
    n_shards a perfect spread is combinatorially out of reach and collisions
    average out anyway, so the search caps at 512 candidate salts."""
    budget = max_salt if n_shards <= 16 else 512
    target = min(n_shards, n_parts)
    best_c, best_n = 0, -1
    for chunk in range(0, budget, 256):
        cs = range(chunk, min(chunk + 256, budget))
        rows = spark.sql(
            "SELECT col1 AS c, pmod(hash(CAST(col1 + col2 AS INT)), "
            f"{int(n_parts)}) AS b FROM VALUES "
            + ",".join(f"({c},{s})" for c in cs for s in range(n_shards))
        ).collect()
        buckets: dict[int, set] = {}
        for r in rows:
            buckets.setdefault(r.c, set()).add(r.b)
        for c in cs:
            n = len(buckets.get(c, ()))
            if n > best_n:
                best_c, best_n = c, n
            if n >= target:
                return c
    return best_c


class IndexHandle:
    """A loaded index: postings/dictionary/docmap DataFrames + meta.

    ``cache()`` pins the (metadata + payload) frames in executor memory so a
    stream of queries pays the parquet scan once — the Spark analogue of a
    search node keeping its segments hot. On a cluster the cache is
    partitioned across executors like any other block-managed data.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = IndexMeta.load(index_dir)
        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self.dictionary = spark.read.parquet(f"{index_dir}/dictionary")
        self.docmap = spark.read.parquet(f"{index_dir}/docmap")
        # driver-side hot caches for the interactive path (a search head
        # keeps its dictionary in RAM): term_id -> (df, idf) with df=0 for
        # terms absent from the index, and ord -> doc_id. Misses are
        # batch-fetched in one pruned-scan job; warm queries schedule no
        # dictionary or docmap job at all. Same staleness contract as the
        # DataFrames above: fixed at handle load.
        self._df_cache: dict[int, tuple[int, float]] = {}
        self._doc_cache: dict[int, int] = {}
        self._shard_view: DataFrame | None = None

    def shard_clustered(self) -> DataFrame:
        """Postings re-clustered so every partition holds COMPLETE shards —
        the layout the no-shuffle interactive kernel needs (a partial top-k
        per (qid, shard) is exact only over all of a shard's blocks). The
        partition key is salted so Murmur3 spreads the n_shards values over
        distinct partitions (plain ``repartition(n, "shard")`` collides a
        handful of values into shared buckets — a straggler doing two
        shards' work while another task idles). In-partition (shard,
        term_id) sort makes the cached batch min/max stats prune the
        per-query term_id IN (...) filter."""
        if self._shard_view is None:
            n_shards = self.meta.n_shards
            salt = _shard_partition_salt(self.spark, n_shards, n_shards)
            self._shard_view = self.postings.repartition(
                n_shards, (F.col("shard") + F.lit(salt)).cast("int")
            ).sortWithinPartitions("shard", "term_id", "first_doc")
        return self._shard_view

    def cache(self) -> "IndexHandle":
        # ONE cached copy of the postings, in the shard-clustered layout:
        # the interactive kernel scans it shuffle-free, and the distributed
        # tail re-shuffles it by (qid, shard) exactly as it would any layout
        self.postings = self.shard_clustered().cache()
        self._shard_view = self.postings
        self.dictionary = self.dictionary.cache()
        self.docmap = self.docmap.cache()
        self.postings.count(), self.dictionary.count(), self.docmap.count()
        return self


# above this many distinct query terms the driver-side isin pushdown (one
# collect + a literal IN list compiled into the scan) stops paying for
# itself: the list no longer fits row-group stat skipping economics and the
# collect becomes a driver bottleneck for offline million-query joins
_ISIN_PUSHDOWN_MAX_TERMS = 4096

# largest interactive batch whose top-k is finished driver-side (coordinator
# merge). Collect volume is bounded by qids x n_shards x (k + 32) rows
_DRIVER_FINISH_MAX_QIDS = 256

# largest batch WORKLOAD routed through the shuffle-free single-stage
# partials (_interactive_partials), measured as sum(df) over the batch's
# scoreable (qid, term) pairs — an upper bound on postings touched, free
# from the probe's df cache. The single-stage plan's parallelism is bounded
# by n_shards (one task per shard scores its qids serially), so it wins
# while per-shard work is small and loses to the grouped exchange plan —
# which spreads qids x shards kernels over the whole cluster — once decode
# work dominates its ~0.6 s of extra machinery. Measured same-session at
# 8 shards/local[32]: fast wins 2x at sum(df) ~1.0M (one hot query, 500k
# docs) and ~1.8M (20 queries, 50k docs); grouped wins 1.5x at ~17.7M
# (20 queries, 500k docs). 6M splits the measured regimes conservatively;
# on a cluster n_shards grows with the corpus, moving the true crossover
# higher, so a too-low constant only forfeits latency, never correctness
# (both plans are score-identical — same _score_blocks kernel).
_FAST_PARTIALS_MAX_POSTINGS = 6_000_000

# largest number of volume-balanced qid slices an interactive batch is split
# into when it overflows _FAST_PARTIALS_MAX_POSTINGS: each slice is an
# independent shuffle-free single-stage job and the slices run CONCURRENTLY
# (guide §2.6 — Spark schedules many jobs in one application; later jobs
# back-fill executors freed by earlier jobs' tails), so batch parallelism is
# n_slices x n_shards with no exchange and no per-query broadcast. Measured
# same-session at 500k docs / 20 queries / sum(df) 17.7M: grouped exchange
# 0.99 s, one single-stage job 1.11 s, 3 concurrent slices 0.63 s. Past the
# cap (enormous <=256-qid batches) the grouped exchange plan takes over —
# its qids x shards kernels spread over a whole cluster.
_MAX_PARTIAL_SLICES = 32

# largest driver-side row set rendered as an inline SQL VALUES relation.
# createDataFrame parallelizes rows into an RDD-backed plan, so broadcasting
# it costs a collect job and collecting it costs a scan job; a VALUES inline
# table is a LocalRelation — both are job-free. Past the cap the SQL text
# (and its parse time) stops paying for itself.
_VALUES_LOCAL_MAX_ROWS = 4096


def _values_local_df(spark: SparkSession, rows_sql: str, proj: str) -> DataFrame:
    """Inline-table DataFrame: stays a LocalRelation through the optimizer
    (ConvertToLocalRelation folds the projection), unlike createDataFrame.
    Only ever fed integer literals and repr()'d finite doubles — repr is
    shortest-round-trip, and both the SQL double literal and CAST parse via
    Java parseDouble, so the bits survive the text round trip exactly."""
    return spark.sql(f"SELECT {proj} FROM VALUES {rows_sql}")


def in_expr(col_name: str, ids) -> "F.Column":
    """``col IN (id, id, ...)`` as ONE parsed SQL expression.

    ``Column.isin(ids)`` builds a JVM Literal per element through py4j —
    measured ~0.47 ms/element of pure driver latency (0.67 s for a
    1429-id candidate fetch, the dominant cost of the flagship's
    point-lookup job). Parsing the equivalent IN list from a single SQL
    string is one py4j call (~0.1 s at 1429 ids, linear and ~5x cheaper
    per element). Same In expression after analysis: integer literals
    coerce to the column type exactly as isin's typed literals do, so
    plans, pushdown, and results are identical. Integer ids only."""
    ids = list(ids)
    assert ids, "in_expr needs a non-empty id list"
    return F.expr(f"{col_name} IN ({','.join(str(int(i)) for i in ids)})")


def _empty_topk_df(spark: SparkSession) -> DataFrame:
    """Empty (qid, doc_id, score, rank) result as a LocalRelation.
    createDataFrame([], schema) parallelizes an empty RDD across the
    default parallelism, so the caller's .collect() schedules a whole
    job of empty tasks just to learn there are no rows; a VALUES row
    behind WHERE 1=0 folds to an empty LocalRelation (PruneFilters +
    ConvertToLocalRelation) and collects job-free — this is the all-OOV
    interactive fast path. The folded plan is constant, so it is built
    once per session (a plan cache, not a result cache: the relation is
    empty by construction) — re-parsing it cost ~5 ms per OOV query."""
    df = getattr(spark, "_spark_graft_empty_topk", None)
    if df is None:
        df = spark.sql(
            "SELECT * FROM VALUES "
            "(CAST(NULL AS LONG), CAST(NULL AS LONG), CAST(NULL AS DOUBLE), "
            "CAST(NULL AS LONG)) t(qid, doc_id, score, `rank`) WHERE 1=0"
        )
        spark._spark_graft_empty_topk = df
    return df


def _bounded_cache_fill(cache: dict, keys, fetch, cap: int = 4_000_000) -> None:
    """Shared bounded-cache fill for the handle's driver-side lookup caches:
    fetch(missing) must insert every requested key. Eviction past `cap`
    resets `missing` to ALL keys — previously-cached entries were just
    wiped, so they must be refetched (the bug class this helper exists to
    make impossible: clearing without widening the fetch set leaves the
    subsequent cache[key] lookups raising KeyError)."""
    missing = [k for k in keys if k not in cache]
    if not missing:
        return
    if len(cache) > cap:
        cache.clear()
        missing = list(keys)
    fetch(missing)


def _driver_finish_topk(
    handle: IndexHandle, partial: DataFrame, k: int
) -> DataFrame:
    """Coordinator merge for interactive batches: collect the per-(qid, shard)
    WAND partials (bounded: qids x shards x (k+32) rows), trim each query to
    its k-boundary tie class, resolve ONLY the surviving ordinals against the
    docmap via an isin-pruned scan, and rank driver-side.

    This is how a search head works (the coordinator merges shard results);
    the distributed tail it replaces joined a handful of partial rows against
    the FULL docmap — a broadcast either way at test scale, but at 10^12 docs
    resolving a few hundred ordinals must be a point lookup (row-group stat
    skipping on the ord column), not a docmap-wide join, and the window that
    ranked them was one more shuffle stage of pure scheduling overhead.

    Parity with the distributed tail (what the 49 driver gates + the
    indexed-vs-exhaustive pytest checks hash): kernel scores are already
    HALF_UP-rounded at SCORE_DECIMALS by ``_score_group_kernel`` (the
    distributed tail's F.round on them is an identity), shards hold disjoint
    doc sets so merge is a union, and (score desc, doc_id asc) is a total
    order — Python's sort over identical float64 values reproduces the
    row_number window bit-for-bit.
    """
    return _driver_finish_rows(handle, partial.collect(), k)


def _driver_finish_rows(handle: IndexHandle, rows: list, k: int) -> DataFrame:
    """Coordinator merge over already-collected partial rows (see
    _driver_finish_topk; the sliced-batch path collects its slices
    concurrently and merges the concatenation here — a qid's every
    (qid, shard) partial lives in exactly one slice, so the row multiset
    is identical to the single-job plan's)."""
    by_qid: dict[int, list] = {}
    for r in rows:
        by_qid.setdefault(r.qid, []).append((r.score, r.ord))
    keep: list[tuple[int, int, float]] = []
    for qid, lst in by_qid.items():
        scores = sorted((s for s, _ in lst), reverse=True)
        s_k = scores[min(k, len(scores)) - 1]
        keep.extend((qid, o, s) for s, o in lst if s >= s_k)
    spark = handle.spark
    if not keep:
        df = _empty_topk_df(spark)
        df._spark_graft_local_topk = []
        return df
    ords = sorted({o for _, o, _ in keep})
    dmap = handle._doc_cache

    def _fetch_docs(missing: list) -> None:
        for r in (
            handle.docmap.filter(in_expr("ord", missing))
            .select("ord", "doc_id")
            .collect()
        ):
            dmap[r.ord] = r.doc_id

    _bounded_cache_fill(dmap, ords, _fetch_docs)
    # one O(n) grouping pass — re-scanning `keep` per qid would be
    # O(qids * qids * shards * k) of driver CPU on the interactive path
    keep_by_qid: dict[int, list[tuple[float, int]]] = {}
    for q, o, s in keep:
        keep_by_qid.setdefault(q, []).append((s, o))
    out: list[tuple[int, int, float, int]] = []
    for qid in sorted(by_qid):
        cands = sorted(
            ((s, dmap[o]) for s, o in keep_by_qid[qid]),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out.extend(
            (int(qid), int(d), float(s), i + 1)
            for i, (s, d) in enumerate(cands)
        )
    if len(out) <= _VALUES_LOCAL_MAX_ROWS:
        # LocalRelation result: the caller's .collect() schedules no job,
        # and composing pipelines broadcast it job-free too. Score doubles
        # ride repr() (shortest-round-trip) through a CAST, bit-exact.
        df = _values_local_df(
            spark,
            ",".join(
                f"({q}L,{d}L,CAST('{s!r}' AS DOUBLE),{r}L)"
                for q, d, s, r in out
            ),
            "col1 AS qid, col2 AS doc_id, col3 AS score, col4 AS `rank`",
        )
    else:
        df = spark.createDataFrame(
            out, schema="qid long, doc_id long, score double, rank long"
        )
    # the rows are already on the driver — expose them so composing
    # pipelines can push the candidate doc_ids into downstream scans
    # (pipelines.attach_candidates prune_ids) without re-collecting
    df._spark_graft_local_topk = out
    return df


def _candidate_blocks(
    handle: IndexHandle, queries: DataFrame
) -> tuple[DataFrame | None, list[int] | None]:
    """Postings blocks for query terms, tagged with qid + idf.

    Returns ``(cand, qids)``: ``cand`` is None when the batch tokenizes to
    no scoreable terms at all (nothing to scan for); ``qids`` is the sorted
    distinct qid list when the interactive probe fully materialized the
    batch (the caller can then finish top-k resolution driver-side), else
    None.

    Query text is tokenized with the SAME mode the index was built with
    (IndexMeta.tokenizer_mode): on a code/code2 index the postings hold
    lowercased (sub)tokens, so a whitespace split of 'parseHTTPServer'
    would match nothing. Terms are hashed to term_id (the same pure
    xxhash64 the build uses — no lookup needed).

    Pushdown strategy (interactive path): the term_id IN (...) filter is
    pushed into the parquet scan as int min/max row-group stat skipping;
    the bytes column is read only for surviving blocks' row groups. qterms
    and dictionary are broadcast. The probe that builds the IN list is ONE
    narrow job (explode + hash + limit-collect, no shuffle): small batches
    are fully materialized by it, so the (qid, term_id) dedupe happens in
    Python and qt becomes a driver-local relation whose broadcast schedules
    no extra job. On this path fixed per-job overhead is the dominant share
    of single-query latency — the previous shape (distributed distinct +
    collect, then a dictionary-presence probe collect) spent two shuffling
    jobs per batch learning what one narrow job already knows. A batch that
    overflows the cap (offline scoring of huge query logs) switches to a
    broadcast hash semi-join on term_id — no driver round-trip, no giant
    literal list in the plan; routing on PAIR count rather than
    distinct-term count only moves the heuristic boundary (interactive
    batches sit orders of magnitude below it, query logs orders above).
    """
    trip = _interactive_trip(handle, queries)
    if trip is _BULK:
        return _bulk_candidate_blocks(handle, queries), None
    if not trip:
        return None, None
    return _cand_from_trip(handle, trip), sorted({t[0] for t in trip})


# sentinel: the batch overflowed the interactive caps (offline query log)
_BULK = object()


def _interactive_trip(handle: IndexHandle, queries: DataFrame):
    """Driver-side probe of an interactive batch.

    Returns ``[(qid, term_id, df, idf), ...]`` for batches that fit the
    interactive caps (the empty list means every term is OOV / no terms at
    all — nothing can score), or the ``_BULK`` sentinel when the batch
    overflows them (offline query log: take the distributed bulk path).

    Probe tiers (cheapest wins):
      1. the caller built the frame with localrel.local_queries_df — the
         raw rows ride an attribute, zero fetch cost;
      2. untagged frame: bounded take() of the raw (qid, text) rows —
         executeTake stops as soon as the interactive cap overflows, so
         a million-row offline log reads only its first partition(s);
      3. row overflow (> _DRIVER_FINISH_MAX_QIDS): the batch is an
         offline log — probe the original frame with coalesce(1) so the
         single merged task consumes its input lazily up to the pair cap.
    Tiers 1-2 tokenize + hash the rows ON THE DRIVER in pure Python
    (functions.tokenizer.py_terms + functions.xxh64.xxh64_str — both
    fuzz-pinned bit-identical to the JVM _terms_col / xxhash64 expressions
    by test_driver_probe.py): the previous shape evaluated the identical
    logic as a Catalyst parse + constant-fold over a VALUES LocalRelation,
    which is job-free but still cost 55-65 ms of driver latency per query
    — the dominant share of the warm all-OOV floor and ~22% of a warm
    scoring query (round-6 probe_breakdown measurement).

    df AND idf come from the handle's hot cache; misses are batch-fetched
    in ONE pruned dictionary scan whose projection computes idf with the
    same JVM F.log expression the exhaustive path uses (a driver-side
    math.log could differ from the JVM's by an ulp and flip a 6dp rounding
    boundary the gates hash), and terms absent from the index are cached
    as df=0. Warm batches schedule no dictionary job — and no second
    Catalyst round-trip to evaluate idf, which used to cost ~40 ms of
    single-query latency.
    """
    mode = handle.meta.tokenizer_mode
    local_rows = getattr(queries, localrel.LOCAL_ROWS_ATTR, None)
    if local_rows is None:
        taken = queries.select("qid", "text").take(_DRIVER_FINISH_MAX_QIDS + 1)
        if len(taken) <= _DRIVER_FINISH_MAX_QIDS:
            local_rows = [(r.qid, r.text) for r in taken]
    if local_rows is not None:
        if not local_rows:
            return []
        # tiers 1-2: pure-Python probe, zero Catalyst work. The token-count
        # cap mirrors the old Catalyst limit exactly (pre-dedupe occurrence
        # count) so routing crosses to _BULK at the same boundary.
        pair_set: set[tuple[int, int]] = set()
        total = 0
        for q_, t_ in local_rows:
            for tok in py_terms(t_, mode):
                total += 1
                if total > _ISIN_PUSHDOWN_MAX_TERMS:
                    return _BULK
                pair_set.add((q_, xxh64_str(tok)))
        pairs = sorted(pair_set)
    else:
        pair_rows = (
            queries.coalesce(1)
            .select("qid", F.explode(_terms_col("text", mode)).alias("term"))
            .filter(F.col("term") != "")
            .select("qid", F.xxhash64("term").alias("term_id"))
            .limit(_ISIN_PUSHDOWN_MAX_TERMS + 1)
            .collect()
        )
        if len(pair_rows) > _ISIN_PUSHDOWN_MAX_TERMS:
            return _BULK
        pairs = sorted({(r.qid, r.term_id) for r in pair_rows})
    if not pairs:
        return []
    cache = handle._df_cache
    qterm_list = sorted({t for _, t in pairs})

    def _fetch_dfs(missing: list) -> None:
        n = float(handle.meta.n_docs)
        idf = F.log(
            F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        for r in (
            handle.dictionary.filter(in_expr("term_id", missing))
            .select("term_id", "df", idf.alias("idf"))
            .collect()
        ):
            cache[r.term_id] = (r.df, r.idf)
        for t in missing:
            cache.setdefault(t, (0, 0.0))

    _bounded_cache_fill(cache, qterm_list, _fetch_dfs)
    return [
        (q, t, cache[t][0], cache[t][1]) for q, t in pairs if cache[t][0] > 0
    ]


def _bulk_candidate_blocks(handle: IndexHandle, queries: DataFrame) -> DataFrame:
    """Large-batch path (huge offline query logs): prune the postings scan
    with a SEMI-join on the DISTINCT term_id set only — the full
    (qid, term_id) frame can be multi-million rows and hinting it
    broadcast would blow Spark's 8 GB broadcast limit / driver memory
    on exactly the workloads this path exists for. No size probe and
    no hint: a probe would cost a full distinct shuffle plus a
    single-task global-limit count per batch just to decide what AQE
    already decides from the REAL post-shuffle size at runtime
    (broadcast when the distinct set is small, shuffle join when it
    is not). The qid attach join is un-hinted for the same reason."""
    n = float(handle.meta.n_docs)
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    idf_dict = F.broadcast(
        handle.dictionary.withColumn("idf", idf).select("term_id", "idf")
    )
    qt = query_terms(queries, mode=handle.meta.tokenizer_mode).select(
        "qid", F.xxhash64("term").alias("term_id")
    )
    pruned = handle.postings.join(
        qt.select("term_id").distinct(), "term_id", "left_semi"
    )
    return pruned.join(qt, "term_id").join(idf_dict, "term_id")


def _cand_from_trip(handle: IndexHandle, trip: list[tuple]) -> DataFrame:
    """Interactive candidate frame for the grouped (distributed-tail) plan:
    postings pruned by a term_id IN literal (parquet / cached-batch stat
    skipping) joined to the broadcast local qt relation. idf doubles were
    already evaluated by the JVM in the dictionary fetch; they ride repr()
    (shortest-round-trip) through a CAST, bit-exact."""
    present = sorted({t for _, t, _, _ in trip})
    if len(trip) <= _VALUES_LOCAL_MAX_ROWS:
        qt = _values_local_df(
            handle.spark,
            ",".join(
                f"({q}L,{t}L,CAST('{i!r}' AS DOUBLE))" for q, t, _, i in trip
            ),
            "col1 AS qid, col2 AS term_id, col3 AS idf",
        )
    else:
        qt = handle.spark.createDataFrame(
            [(q, t, i) for q, t, _, i in trip],
            "qid long, term_id long, idf double",
        )
    return handle.postings.filter(in_expr("term_id", present)).join(
        F.broadcast(qt), "term_id"
    )


def _interactive_partials(
    handle: IndexHandle,
    trip: list[tuple],
    keep_n: int,
    k1: float,
    b: float,
    use_wand: bool,
) -> DataFrame:
    """No-shuffle per-(qid, shard) WAND partials for interactive batches.

    The grouped plan (scan -> Exchange hashpartitioning(qid, shard) ->
    applyInPandas) pays a full shuffle stage plus a per-query broadcast
    join for what is, per query, a few thousand metadata rows — on a warm
    cached index that shuffle is the dominant share of single-query
    latency (guide §2.4: remove shuffles outright where the data is
    already partitioned as needed). Here the postings are scanned in the
    shard-clustered layout (IndexHandle.shard_clustered: every partition
    holds complete shards), so one mapInArrow pass computes the exact
    per-(qid, shard) partials with ZERO exchanges: the query->term->idf
    mapping rides the task closure (a few hundred bytes — no broadcast
    build, no join), and rows are regrouped per shard in NumPy. Partial
    exactness is unchanged — it only ever needed all of a shard's blocks
    together, which the partition layout now guarantees.

    1 Spark stage per query vs 2 + exchange before; scores are identical
    by construction (_score_blocks is the same kernel both plans call).
    """
    import pyarrow as pa

    by_term: dict[int, list[tuple[int, float]]] = {}
    for q, t, _, idf_v in trip:
        by_term.setdefault(t, []).append((q, idf_v))
    present = sorted(by_term)
    avgdl = handle.meta.avgdl

    def kernel(batches):
        tabs = [pa.Table.from_batches([rb]) for rb in batches if rb.num_rows]
        if not tabs:
            return
        tab = pa.concat_tables(tabs)
        terms = tab.column("term_id").to_numpy()
        shards = tab.column("shard").to_numpy()
        first = tab.column("first_doc").to_numpy()
        last = tab.column("last_doc").to_numpy()
        ns = tab.column("n").to_numpy().astype(np.int64)
        mtf = tab.column("max_tf").to_numpy().astype(np.float64)
        mdl = tab.column("min_dl").to_numpy().astype(np.float64)
        byte_arr = tab.column("bytes").combine_chunks()
        out_q, out_o, out_s = [], [], []
        order = np.argsort(shards, kind="stable")
        sh_sorted = shards[order]
        sh_start = np.nonzero(np.r_[True, sh_sorted[1:] != sh_sorted[:-1]])[0]
        sh_end = np.r_[sh_start[1:], len(sh_sorted)]
        for s0, e0 in zip(sh_start, sh_end):
            rows_sh = order[s0:e0]
            t_sh = terms[rows_sh]
            t_order = np.argsort(t_sh, kind="stable")
            t_sorted = t_sh[t_order]
            t_start = np.nonzero(np.r_[True, t_sorted[1:] != t_sorted[:-1]])[0]
            t_end = np.r_[t_start[1:], len(t_sorted)]
            term_rows = {
                int(t_sorted[i0]): rows_sh[t_order[i0:i1]]
                for i0, i1 in zip(t_start, t_end)
            }
            per_qid: dict[int, tuple[list, list]] = {}
            for t, rows_t in term_rows.items():
                for q, idf_v in by_term[t]:
                    acc = per_qid.setdefault(q, ([], []))
                    acc[0].append(rows_t)
                    acc[1].append(np.full(len(rows_t), idf_v))
            for q, (rlist, ilist) in per_qid.items():
                rq = np.concatenate(rlist)
                ords, scores, _, _ = _score_blocks(
                    np.concatenate(ilist),
                    mtf[rq], mdl[rq], first[rq], last[rq], terms[rq], ns[rq],
                    lambda i, rq=rq: byte_arr[int(rq[i])].as_py(),
                    k=keep_n, k1=k1, b=b, avgdl=avgdl, use_wand=use_wand,
                )
                if len(ords):
                    out_q.append(np.full(len(ords), q, dtype=np.int64))
                    out_o.append(ords)
                    out_s.append(scores)
        if out_q:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_o)),
                    pa.array(np.concatenate(out_s)),
                ],
                names=["qid", "ord", "score"],
            )

    return (
        handle.shard_clustered()
        .filter(in_expr("term_id", present))
        .select(
            "term_id", "shard", "first_doc", "last_doc", "n",
            "max_tf", "min_dl", "bytes",
        )
        .mapInArrow(kernel, schema="qid long, ord long, score double")
    )


def _sliced_partial_rows(
    handle: IndexHandle,
    trip: list[tuple],
    n_slices: int,
    keep_n: int,
    k1: float,
    b: float,
    use_wand: bool,
) -> list:
    """Split an interactive batch into ``n_slices`` volume-balanced qid
    slices (greedy LPT over per-qid sum(df)), run each slice's shuffle-free
    single-stage partials as an independent Spark job, CONCURRENTLY, and
    return the concatenated partial rows for the coordinator merge.

    Exactness: slices partition whole qids, so every (qid, shard) partial
    is computed by exactly one slice from exactly the rows the single-job
    plan would feed it — the merged row multiset is identical (pinned by
    test_sliced_batch_matches_grouped_and_distributed).
    """
    per_qid: dict[int, list[tuple]] = {}
    for tup in trip:
        per_qid.setdefault(tup[0], []).append(tup)
    loads = sorted(
        ((sum(t[2] for t in v), q) for q, v in per_qid.items()), reverse=True
    )
    bins: list[list] = [[] for _ in range(min(n_slices, len(per_qid)))]
    fill = [0] * len(bins)
    for load, q in loads:
        i = min(range(len(bins)), key=fill.__getitem__)
        fill[i] += load
        bins[i].extend(per_qid[q])
    slices = [b_ for b_ in bins if b_]
    # build the shard view once before the pool: concurrent first calls
    # would benignly race the cached-view memo
    handle.shard_clustered()

    def run(sl: list) -> list:
        return _interactive_partials(
            handle, sl, keep_n, k1, b, use_wand
        ).collect()

    with ThreadPoolExecutor(max_workers=min(len(slices), 8)) as ex:
        return [r for rs in ex.map(run, slices) for r in rs]


def _grouped_partials(
    handle: IndexHandle,
    cand: DataFrame,
    keep_n: int,
    k1: float,
    b: float,
    use_wand: bool,
) -> DataFrame:
    """Exchange-based per-(qid, shard) WAND partials: the plan that spreads
    qids x shards kernel groups over the whole cluster (batches and the
    offline bulk path)."""
    avgdl = handle.meta.avgdl

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ords, scores, _, _ = _score_group_kernel(
            pdf, k=keep_n, k1=k1, b=b, avgdl=avgdl, use_wand=use_wand
        )
        return pd.DataFrame({"qid": key[0], "ord": ords, "score": scores})

    # explicit projection: applyInPandas ships every input column through
    # Arrow, and the candidate frame still carries block_id, which the
    # kernel never reads (guide §4.1 — pass only what the function needs)
    cols = [
        "qid", "shard", "term_id", "idf", "first_doc", "last_doc",
        "n", "max_tf", "min_dl", "bytes",
    ]
    return cand.select(*cols).groupBy("qid", "shard").applyInPandas(
        run, schema="qid long, ord long, score double"
    )


def bm25_topk_indexed(
    spark: SparkSession,
    index: str | IndexHandle,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    method: str = "wand",
    finish: str = "auto",
) -> DataFrame:
    """-> (qid, doc_id, score, rank): identical output contract (and values)
    as the exhaustive tf-frame ``bm25.bm25_topk``. Pass an ``IndexHandle``
    (optionally .cache()d) to amortize index loading across queries.

    ``finish`` selects the top-k tail after the per-(qid, shard) WAND
    partials: ``"auto"`` (default) uses the coordinator merge for
    interactive batches (<= _DRIVER_FINISH_MAX_QIDS qids) and the
    distributed docmap-join + window tail otherwise; ``"distributed"`` /
    ``"driver"`` force one side — the distributed tail is the plan offline
    million-query logs run on a cluster, so it is independently driver-gated
    (``bm25_topk_wand_distributed``) rather than only reachable past the
    batch-size threshold. Both finishes are bit-identical by construction
    (see _driver_finish_topk) and pinned so by
    test_driver_finish_matches_distributed_tail."""
    if finish not in ("auto", "driver", "distributed"):
        raise ValueError(f"finish must be auto|driver|distributed, got {finish!r}")
    if k < 1:
        # the driver finish would slice nonsense (scores[k-1] wraps negative)
        # while the distributed window returns empty — fail loudly instead
        raise ValueError(f"k must be >= 1, got {k}")
    handle = IndexHandle(spark, index) if isinstance(index, str) else index
    use_wand = method == "wand"

    # per-shard partials keep k + headroom: rounded-score ties across distinct
    # (tf, dl) profiles are ordered by doc_id in the final window, and ordinal
    # order within a shard is (doc_len, doc_id) — the headroom guarantees every
    # possible tie-class member at the k boundary survives the shard cut
    keep_n = k + 32

    trip = _interactive_trip(handle, queries)
    if trip is not _BULK:
        if not trip:
            df = _empty_topk_df(spark)
            df._spark_graft_local_topk = []
            return df
        qids = sorted({t[0] for t in trip})
        if finish != "distributed" and len(qids) <= _DRIVER_FINISH_MAX_QIDS:
            # interactive fast paths: shuffle-free per-(qid, shard) partials
            # over the shard-clustered postings + coordinator merge. Small
            # workloads run as ONE single-stage job; larger batches split
            # into volume-balanced qid slices run as concurrent single-stage
            # jobs (parallelism n_slices x n_shards, still zero exchanges);
            # only single-qid overflows and batches past the slice cap take
            # the grouped exchange plan.
            total_df = sum(t[2] for t in trip)
            n_slices = -(-total_df // _FAST_PARTIALS_MAX_POSTINGS)
            if n_slices <= 1:
                partial = _interactive_partials(
                    handle, trip, keep_n, k1, b, use_wand
                )
                return _driver_finish_topk(handle, partial, k)
            if len(qids) > 1 and n_slices <= _MAX_PARTIAL_SLICES:
                rows = _sliced_partial_rows(
                    handle, trip, n_slices, keep_n, k1, b, use_wand
                )
                return _driver_finish_rows(handle, rows, k)
        cand = _cand_from_trip(handle, trip)
        if finish != "distributed" and len(qids) <= _DRIVER_FINISH_MAX_QIDS:
            partial = _grouped_partials(handle, cand, keep_n, k1, b, use_wand)
            return _driver_finish_topk(handle, partial, k)
    else:
        cand = _bulk_candidate_blocks(handle, queries)
        qids = None

    partial = _grouped_partials(handle, cand, keep_n, k1, b, use_wand)
    if finish == "driver":
        return _driver_finish_topk(handle, partial, k)
    resolved = partial.join(handle.docmap, "ord").select("qid", "doc_id", "score")
    ranked = grouped_topk(
        resolved.withColumn("score", F.round("score", SCORE_DECIMALS)),
        keys=["qid"],
        order=[F.col("score").desc(), F.col("doc_id").asc()],
        k=k,
    )
    return ranked.select("qid", "doc_id", "score", "rank")


def wand_block_stats(
    spark: SparkSession,
    index: str | IndexHandle,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Diagnostics: per (qid, shard) blocks seen vs decoded under WAND."""
    handle = IndexHandle(spark, index) if isinstance(index, str) else index
    meta = handle.meta
    cand, _ = _candidate_blocks(handle, queries)
    if cand is None:
        return spark.createDataFrame(
            [], schema="qid long, shard int, n_blocks long, n_decoded long"
        )

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, _, nb, ndec = _score_group_kernel(
            pdf, k=k, k1=k1, b=b, avgdl=meta.avgdl, use_wand=True
        )
        return pd.DataFrame(
            {"qid": [key[0]], "shard": [key[1]], "n_blocks": [nb], "n_decoded": [ndec]}
        )

    return cand.groupBy("qid", "shard").applyInPandas(
        run, schema="qid long, shard int, n_blocks long, n_decoded long"
    )
