"""Index lifecycle invariants (FIXTURES.md §E):
  * indexed exhaustive scoring == tf-frame BM25 (rank-identical, same scores)
  * block-max WAND == exhaustive on every fixture query
  * resume-after-kill completes only missing partitions, identical results
  * permutation invariance: input partitioning never changes the index
  * content_sha256 survives the pipeline (BASELINE.json per-row invariant)
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.functions.tokenizer import doc_stats, tokenize_terms
from geometric_aware_retrieval_v2_spark.operators import bm25
from geometric_aware_retrieval_v2_spark.operators.index import (
    build_index,
    bm25_topk_indexed,
    wand_block_stats,
)
from geometric_aware_retrieval_v2_spark.plans import manifest as mf
from geometric_aware_retrieval_v2_spark.queryset import queries_df
from geometric_aware_retrieval_v2_spark.sources.tables import docs_from_documents
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index") / "idx")
    docs = docs_from_documents(spark, SF_SMOKE)
    build_index(spark, docs, d, n_partitions=4, n_shards=4, block_size=64)
    return d


def _collect_topk(df):
    return sorted(
        (r.qid, r.doc_id, r.score, r.rank) for r in df.collect()
    )


def test_indexed_matches_tf_frame(spark, index_dir):
    docs = docs_from_documents(spark, SF_SMOKE)
    want = _collect_topk(
        bm25.bm25_topk(tokenize_terms(docs), doc_stats(docs), queries_df(spark), k=10)
    )
    got = _collect_topk(
        bm25_topk_indexed(spark, index_dir, queries_df(spark), k=10, method="exhaustive")
    )
    assert got == want


def test_wand_equals_exhaustive(spark, index_dir):
    ex = _collect_topk(
        bm25_topk_indexed(spark, index_dir, queries_df(spark), k=10, method="exhaustive")
    )
    wd = _collect_topk(
        bm25_topk_indexed(spark, index_dir, queries_df(spark), k=10, method="wand")
    )
    assert wd == ex


def test_wand_skips_blocks(spark, tmp_path):
    """Pruning needs idf spread: on the uniform 31-term driver corpus there is
    nothing to skip (every term is in ~90% of docs), so exercise WAND on the
    Zipf(1.2) synthetic code corpus with a rare+hot term query."""
    from geometric_aware_retrieval_v2_spark.sources.corpus import (
        corpus_to_docs,
        synth_corpus_files,
    )
    from geometric_aware_retrieval_v2_spark.operators.index import build_index as bi

    d = str(tmp_path / "zipf_idx")
    docs = corpus_to_docs(synth_corpus_files(spark, 2000, partitions=8)).select(
        "doc_id", "content"
    )
    bi(spark, docs, d, n_partitions=2, n_shards=2, block_size=64, tokenizer_mode="code")
    qs = spark.createDataFrame(
        [(1, "def ident_3999"), (2, "return val ident_2500"), (3, "class import")],
        schema="qid long, text string",
    )
    stats = wand_block_stats(spark, d, qs, k=10).agg(
        F.sum("n_blocks").alias("nb"), F.sum("n_decoded").alias("nd")
    ).collect()[0]
    assert stats.nd < stats.nb, f"WAND decoded all {stats.nb} blocks — no pruning"
    # and it must stay exact
    ex = _collect_topk(bm25_topk_indexed(spark, d, qs, k=10, method="exhaustive"))
    wd = _collect_topk(bm25_topk_indexed(spark, d, qs, k=10, method="wand"))
    assert wd == ex


def test_resume_and_permutation_invariance(spark, index_dir, tmp_path):
    docs = docs_from_documents(spark, SF_SMOKE)

    # permutation invariance: different input partitioning -> same results
    d2 = str(tmp_path / "idx2")
    build_index(spark, docs.repartition(13), d2, n_partitions=4, n_shards=4, block_size=64)
    a = _collect_topk(bm25_topk_indexed(spark, index_dir, queries_df(spark), k=10))
    b = _collect_topk(bm25_topk_indexed(spark, d2, queries_df(spark), k=10))
    assert a == b

    # resume: kill after 2 committed docstats partitions -> resume completes
    d3 = str(tmp_path / "idx3")
    with pytest.raises(RuntimeError):
        _build_partial(spark, docs, d3)
    done_before = set(mf.completed_partitions(spark, d3, "docstats"))
    assert len(done_before) == 2
    build_index(spark, docs, d3, n_partitions=4, n_shards=4, block_size=64)
    assert set(mf.completed_partitions(spark, d3, "docstats")) == {0, 1, 2, 3}
    assert set(mf.completed_partitions(spark, d3, "segments")) == {0, 1, 2, 3}
    c = _collect_topk(bm25_topk_indexed(spark, d3, queries_df(spark), k=10))
    assert c == a
    # the resumed run must not have rewritten completed partitions: manifest
    # has exactly one row per (stage, partition)
    m = mf.read_manifest(spark, d3)
    per_part = m.groupBy("stage", "partition_id").count().collect()
    assert all(r["count"] == 1 for r in per_part)


def _build_partial(spark, docs, index_dir):
    """Simulate a crash after 2 segment partitions by monkey-layering."""
    import geometric_aware_retrieval_v2_spark.operators.index as idx

    import threading

    calls = {"n": 0}
    lock = threading.Lock()
    orig = mf.append_manifest

    def crashing(spark_, dir_, rows):
        # commit 1 is the params row; commits 2-3 are docstats partitions,
        # then the "machine dies" — leaving exactly 2 committed partitions
        with lock:
            calls["n"] += 1
            n = calls["n"]
        if n > 3:
            raise RuntimeError("simulated crash")
        orig(spark_, dir_, rows)
        if n == 3:
            raise RuntimeError("simulated crash")

    mf_append = mf.append_manifest
    try:
        mf.append_manifest = crashing
        idx.mf.append_manifest = crashing
        build_index(spark, docs, index_dir, n_partitions=4, n_shards=4, block_size=64)
    finally:
        mf.append_manifest = mf_append
        idx.mf.append_manifest = mf_append


def test_content_sha_invariant(spark, index_dir):
    """docstats sha256 equals recomputing from the source table row-by-row."""
    src = docs_from_documents(spark, SF_SMOKE).select(
        "doc_id", F.sha2("content", 256).alias("expected")
    )
    stored = spark.read.parquet(f"{index_dir}/docstats").select("doc_id", "content_sha256")
    n_total = src.count()
    n_match = stored.join(src, "doc_id").filter(
        F.col("content_sha256") == F.col("expected")
    ).count()
    assert n_match == n_total


def test_compact_merge_equals_logical_merge(spark, index_dir):
    """compact=True (decode -> reshuffle -> repack) must carry exactly the
    same postings as the logical concat merge; and a WAND query over the
    compacted postings returns identical results."""
    from geometric_aware_retrieval_v2_spark.operators.postings import (
        merge_segments,
        unpack_postings,
    )

    segments = spark.read.parquet(f"{index_dir}/segments")
    logical = merge_segments(segments, n_shards=4, block_size=64, compact=False)
    compacted = merge_segments(segments, n_shards=4, block_size=64, compact=True)
    key = lambda r: (r.term_id, r.shard, r.doc_id, r.tf, r.dl)
    a = sorted(map(key, unpack_postings(logical).collect()))
    b = sorted(map(key, unpack_postings(compacted).collect()))
    assert a == b
    # compacted blocks are per-(term, shard) disjoint and doc-sorted
    rows = compacted.collect()
    by_ts: dict = {}
    for r in rows:
        by_ts.setdefault((r.term_id, r.shard), []).append((r.first_doc, r.last_doc))
    for spans in by_ts.values():
        spans.sort()
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 < b0, "overlapping compacted blocks"


def test_pack_width_bounds_buffer_and_preserves_postings(spark, index_dir):
    """The pack shuffle width must be sized from the data (bounded per-task
    pandas buffer at any corpus size), and an explicit width must not change
    the postings content — only the physical layout."""
    from geometric_aware_retrieval_v2_spark.operators.postings import (
        ROWS_PER_PACK_TASK,
        pack_postings,
        pack_width,
        unpack_postings,
    )

    # width math: parallelism floor on small inputs, row ceiling on huge ones
    assert pack_width(0, 32) == 32
    assert pack_width(10_000, 32) == 32
    assert pack_width(40 * ROWS_PER_PACK_TASK, 32) == 40
    assert pack_width(40 * ROWS_PER_PACK_TASK + 1, 32) == 41
    assert pack_width(10**12 * 200, 32) == -(-(10**12 * 200) // ROWS_PER_PACK_TASK)

    # explicit n_tasks controls the physical width and preserves content
    # deterministic subset (limit() re-samples per action)
    tf = unpack_postings(spark.read.parquet(f"{index_dir}/segments")).filter(
        F.pmod(F.col("term_id"), F.lit(11)) == 0
    )
    key = lambda r: (r.term_id, r.shard, r.doc_id, r.tf, r.dl)
    base = pack_postings(tf, n_shards=4, block_size=64)
    wide = pack_postings(tf, n_shards=4, block_size=64, n_tasks=7)
    assert wide.rdd.getNumPartitions() == 7
    assert sorted(map(key, unpack_postings(base).collect())) == sorted(
        map(key, unpack_postings(wide).collect())
    )


def test_fast_partials_match_grouped_and_distributed(spark, index_dir):
    """The shuffle-free single-stage partials (batches <= _FAST_PARTIALS_
    MAX_QIDS), the grouped-exchange driver finish, and the fully distributed
    tail must be bit-identical on the same small batch — all three consume
    the same _score_blocks kernel, and this pins the routing seams."""
    from geometric_aware_retrieval_v2_spark.localrel import local_queries_df
    from geometric_aware_retrieval_v2_spark.operators import index as ix

    small = local_queries_df(
        spark, [(1, "hash join"), (2, "table scan"), (9, "the a")]
    )
    h0 = ix.IndexHandle(spark, index_dir)
    assert (
        sum(t[2] for t in ix._interactive_trip(h0, small))
        <= ix._FAST_PARTIALS_MAX_POSTINGS
    ), "fixture batch must route through the single-stage plan"
    fast = _collect_topk(bm25_topk_indexed(spark, index_dir, small, k=10))
    dist = _collect_topk(
        bm25_topk_indexed(spark, index_dir, small, k=10, finish="distributed")
    )
    assert fast == dist and len(fast) > 0
    # grouped + driver finish (what 5..256-qid batches run)
    h = ix.IndexHandle(spark, index_dir)
    trip = ix._interactive_trip(h, small)
    partial = ix._grouped_partials(
        h, ix._cand_from_trip(h, trip), 42, 1.2, 0.75, True
    )
    grouped = sorted(
        (r.qid, r.doc_id, r.score, r.rank)
        for r in ix._driver_finish_topk(h, partial, 10).collect()
    )
    assert grouped == fast


def test_sliced_batch_matches_grouped_and_distributed(spark, index_dir, monkeypatch):
    """Batches whose sum(df) overflows _FAST_PARTIALS_MAX_POSTINGS split into
    volume-balanced qid slices run as concurrent single-stage jobs. Force the
    sliced route by shrinking the threshold and pin it bit-identical to the
    single-job fast path, the grouped driver finish, and the distributed tail."""
    from geometric_aware_retrieval_v2_spark.localrel import local_queries_df
    from geometric_aware_retrieval_v2_spark.operators import index as ix

    batch = local_queries_df(
        spark, [(1, "hash join"), (2, "table scan"), (3, "merge sort"),
                (9, "the a"), (11, "nosuchterm zzz")]
    )
    want = _collect_topk(
        bm25_topk_indexed(spark, index_dir, batch, k=10, finish="distributed")
    )
    h = ix.IndexHandle(spark, index_dir)
    trip = ix._interactive_trip(h, batch)
    total_df = sum(t[2] for t in trip)
    assert total_df > 3, "fixture batch too small to slice meaningfully"
    # threshold forcing ~3 slices; routing must land on _sliced_partial_rows
    monkeypatch.setattr(ix, "_FAST_PARTIALS_MAX_POSTINGS", max(1, total_df // 3))
    calls = []
    orig = ix._sliced_partial_rows

    def spy(*a, **kw):
        calls.append(a[2])
        return orig(*a, **kw)

    monkeypatch.setattr(ix, "_sliced_partial_rows", spy)
    got = _collect_topk(bm25_topk_indexed(spark, index_dir, batch, k=10))
    assert calls and calls[0] >= 2, "sliced route did not engage"
    assert got == want and len(got) > 0
    # direct slice-row parity: merged rows == single-job plan's rows
    rows_sliced = sorted(
        (r.qid, r.ord, r.score)
        for r in orig(h, trip, 3, 42, 1.2, 0.75, True)
    )
    rows_single = sorted(
        (r.qid, r.ord, r.score)
        for r in ix._interactive_partials(h, trip, 42, 1.2, 0.75, True).collect()
    )
    assert rows_sliced == rows_single


def test_pack_narrowed_types_identical(spark, index_dir):
    """The segments job narrows tf/dl to int32 before the pack shuffle
    (guide §2.3): the packed block rows — payload bytes included — must be
    bit-identical to packing the original int64 columns."""
    from geometric_aware_retrieval_v2_spark.operators.postings import (
        pack_postings,
    )

    tf = unpack_for_test(spark, index_dir)
    key = lambda r: (
        r.term_id, r.shard, r.block_id, r.first_doc, r.last_doc,
        r.n, r.max_tf, r.min_dl, bytes(r.bytes),
    )
    wide = pack_postings(tf, n_shards=4, block_size=64, n_tasks=5)
    narrow = pack_postings(
        tf.withColumn("tf", F.col("tf").cast("int")).withColumn(
            "dl", F.col("dl").cast("int")
        ),
        n_shards=4, block_size=64, n_tasks=5,
    )
    assert sorted(map(key, wide.collect())) == sorted(map(key, narrow.collect()))


def unpack_for_test(spark, index_dir):
    from geometric_aware_retrieval_v2_spark.operators.postings import (
        unpack_postings,
    )

    return unpack_postings(spark.read.parquet(f"{index_dir}/segments")).filter(
        F.pmod(F.col("term_id"), F.lit(7)) == 0
    )


def test_docmap_shuffle_join_equals_broadcast(spark, index_dir, tmp_path):
    """The docmap join strategy is picked from the committed doc count
    (broadcast below docmap_broadcast_max_rows, shuffle join past it — a
    corpus-proportional table cannot be hardwired-broadcast at 10^12 docs).
    Forcing the shuffle-join path must produce an identical index, and the
    strategy input (stage_rows_total over the docstats commits) must equal
    the real document count without running a counting job."""
    from geometric_aware_retrieval_v2_spark.operators.postings import unpack_postings

    docs = docs_from_documents(spark, SF_SMOKE)
    d2 = str(tmp_path / "idx_shuffle_join")
    build_index(spark, docs, d2, n_partitions=4, n_shards=4, block_size=64,
                docmap_broadcast_max_rows=0)

    assert mf.stage_rows_total(spark, d2, "docstats") == docs.count()

    key = lambda r: (r.term_id, r.shard, r.doc_id, r.tf, r.dl)
    a = sorted(map(key, unpack_postings(
        spark.read.parquet(f"{index_dir}/postings")).collect()))
    b = sorted(map(key, unpack_postings(
        spark.read.parquet(f"{d2}/postings")).collect()))
    assert a == b

    wd = _collect_topk(
        bm25_topk_indexed(spark, d2, queries_df(spark), k=10, method="wand")
    )
    base = _collect_topk(
        bm25_topk_indexed(spark, index_dir, queries_df(spark), k=10, method="wand")
    )
    assert wd == base


def test_resume_with_different_params_raises(spark, index_dir, tmp_path):
    """Completed artifacts are keyed by pmod(xxhash64(doc_id), n_partitions);
    resuming under different parameters must refuse instead of silently
    dropping the documents whose stale bp falls outside the new loop."""
    docs = docs_from_documents(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="parameters"):
        build_index(spark, docs, index_dir, n_partitions=2, n_shards=4, block_size=64)
    with pytest.raises(ValueError, match="parameters"):
        build_index(spark, docs, index_dir, n_partitions=4, n_shards=4, block_size=32)
    # same params: still a clean idempotent resume
    build_index(spark, docs, index_dir, n_partitions=4, n_shards=4, block_size=64)


def test_invalid_build_params_rejected(spark, tmp_path):
    docs = docs_from_documents(spark, SF_SMOKE)
    with pytest.raises(ValueError):
        build_index(spark, docs, str(tmp_path / "bad1"), n_partitions=0)
    with pytest.raises(ValueError):
        build_index(spark, docs, str(tmp_path / "bad2"), block_size=4)
    with pytest.raises(ValueError):
        build_index(spark, docs, str(tmp_path / "bad3"), tokenizer_mode="nope")


def test_vocab_collision_gate():
    from geometric_aware_retrieval_v2_spark.operators.index import _check_vocab

    _check_vocab(100, 100)  # clean vocabulary passes
    with pytest.raises(RuntimeError, match="collision"):
        _check_vocab(100, 99)


def test_manifest_on_schemed_path(spark, tmp_path):
    """A 'file://'-schemed index_dir exercises the non-POSIX commit path
    (Spark-job append) that an HDFS/S3 index_dir would take; resume
    bookkeeping must behave identically."""
    d = "file://" + str(tmp_path / "remote_idx")
    assert not mf.is_local_path("hdfs://nn/idx") and not mf.is_local_path("s3a://b/idx")
    assert mf.is_local_path(str(tmp_path)) and mf.is_local_path(d)
    # file:// IS local-addressable; force the Spark commit path via a fake
    # scheme check by calling append on an hdfs-shaped path is not possible
    # in-sandbox, so pin the dispatch decision itself plus the local round
    # trip through the schemed path
    mf.append_manifest(spark, d, [mf.manifest_row("r", "docstats", 3, "fp", 1, 0, 1, d)])
    got = mf.completed_partitions(spark, d, "docstats")
    assert got == {3: "fp"}


def test_manifest_spark_commit_path(spark, tmp_path, monkeypatch):
    """Force the non-local dispatch (what hdfs://... would take): commits
    route through a Spark append job, reads probe via spark.read — the
    driver-POSIX fast path must never be touched."""
    import os

    d = str(tmp_path / "rmt")
    monkeypatch.setattr(mf, "is_local_path", lambda p: False)
    monkeypatch.setattr(mf.os, "rename", lambda *a: (_ for _ in ()).throw(AssertionError("POSIX path used")))
    # fresh dir: read path must return empty without raising
    assert mf.completed_partitions(spark, d, "docstats") == {}
    mf.append_manifest(spark, d, [mf.manifest_row("r", "segments", 7, "fp7", 1, 0, 1, d)])
    mf.append_manifest(spark, d, [mf.manifest_row("r", "segments", 8, "fp8", 1, 0, 1, d)])
    assert mf.completed_partitions(spark, d, "segments") == {7: "fp7", 8: "fp8"}


def test_high_partition_build_with_ingest_stage(spark, tmp_path_factory):
    """n_partitions > 8 triggers the partitioned-input ingest stage; the
    resulting index must answer queries identically to the low-P build, and
    resume must recognize the committed ingest stage."""
    d = str(tmp_path_factory.mktemp("hp") / "idx")
    docs = docs_from_documents(spark, SF_SMOKE)
    build_index(spark, docs, d, n_partitions=12, n_shards=4, block_size=64)
    assert -1 in mf.completed_partitions(spark, d, "ingest")
    got = _collect_topk(
        bm25_topk_indexed(spark, d, queries_df(spark), k=10, method="wand")
    )
    want = _collect_topk(
        bm25.bm25_topk(tokenize_terms(docs), doc_stats(docs), queries_df(spark), k=10)
    )
    assert got == want
    # idempotent resume: nothing to do on a second call, results unchanged
    build_index(spark, docs, d, n_partitions=12, n_shards=4, block_size=64)
    assert _collect_topk(
        bm25_topk_indexed(spark, d, queries_df(spark), k=10, method="wand")
    ) == want


def test_bounded_cache_fill_refetches_evicted_keys():
    """Eviction must widen the fetch set to ALL requested keys — clearing
    without that left previously-cached keys missing and the caller's
    cache[key] lookups crashing (round-5 review finding)."""
    from geometric_aware_retrieval_v2_spark.operators.index import (
        _bounded_cache_fill,
    )

    cache = {i: i for i in range(10)}
    calls: list[list[int]] = []

    def fetch(missing):
        calls.append(list(missing))
        cache.update({k: k for k in missing})

    _bounded_cache_fill(cache, [5, 99], fetch, cap=8)
    assert 5 in cache and 99 in cache  # 5 was evicted, then refetched
    assert calls == [[5, 99]]
    # no-op when everything is cached: fetch not called
    _bounded_cache_fill(cache, [5, 99], fetch, cap=8)
    assert calls == [[5, 99]]


def test_bm25_topk_indexed_rejects_nonpositive_k(spark):
    with pytest.raises(ValueError, match="k must be >= 1"):
        bm25_topk_indexed(spark, "/nonexistent", queries_df(spark), k=0)
