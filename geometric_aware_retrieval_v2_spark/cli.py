"""spark-submit job entry points (reference CLI parity: encode/search/audit/
eval at /root/reference/geoIR/cli.py:21-154, re-expressed as cluster jobs).

Usage (local or on a cluster):
    spark-submit --py-files gar2.zip -m geometric_aware_retrieval_v2_spark.cli \\
        build-index --input /path/corpus.parquet --index /path/index
    ... search --index /path/index --query "hash join" --k 10 \\
               [--rerank geodesic --embeddings /path/emb.parquet]
    ... audit  --index-embeddings /path/emb.parquet --k 5
    ... eval   --run run.parquet --qrels qrels.parquet --k 10
    ... compact --index /path/index
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    """``spark=None`` (spark-submit path) builds and owns a session;
    passing one (tests, notebooks) reuses it and leaves it running."""
    from pyspark.sql import functions as F

    from geometric_aware_retrieval_v2_spark.session import get_spark

    owns_session = spark is None

    p = argparse.ArgumentParser(prog="gar2-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index")
    b.add_argument("--input", required=True, help="parquet with (doc_id, content)")
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=8)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--tokenizer", default="code", choices=["ws", "code", "code2"])

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--method", default="wand", choices=["wand", "exhaustive"])
    s.add_argument("--rerank", default="none", choices=["none", "geodesic"])
    s.add_argument("--embeddings", default=None,
                   help="parquet (vec_id, embedding); required with --rerank geodesic")
    s.add_argument("--search-k", type=int, default=100,
                   help="candidate pool size fed to the rerank stage")

    a = sub.add_parser("audit")
    a.add_argument("--embeddings", required=True, help="parquet (vec_id, embedding)")
    a.add_argument("--k", type=int, default=5)
    a.add_argument("--curvature", default="forman",
                   choices=["forman", "ollivier"],
                   help="forman (reference fallback parity, default) or "
                        "exact Ollivier-Ricci (alpha=0.5)")

    e = sub.add_parser("eval")
    e.add_argument("--run", required=True, help="parquet (qid, doc_id, score)")
    e.add_argument("--qrels", required=True, help="parquet (qid, doc_id, rel)")
    e.add_argument("--k", type=int, default=10)

    c = sub.add_parser("compact", help="physical segment compaction (background merge)")
    c.add_argument("--index", required=True)

    args = p.parse_args(argv)
    if spark is None:
        spark = get_spark(app_name=f"gar2-{args.cmd}")

    if args.cmd == "build-index":
        from geometric_aware_retrieval_v2_spark.operators.index import build_index

        meta = build_index(
            spark,
            spark.read.parquet(args.input),
            args.index,
            n_partitions=args.partitions,
            n_shards=args.shards,
            tokenizer_mode=args.tokenizer,
        )
        print(json.dumps(meta.__dict__))
    elif args.cmd == "search":
        from geometric_aware_retrieval_v2_spark.localrel import local_queries_df

        q = local_queries_df(spark, [(0, args.query)])
        if args.rerank == "geodesic":
            if not args.embeddings:
                raise SystemExit("--rerank geodesic requires --embeddings")
            from geometric_aware_retrieval_v2_spark.operators.pipelines import (
                bm25_geodesic_indexed,
            )

            rows = bm25_geodesic_indexed(
                spark, args.index, spark.read.parquet(args.embeddings), q,
                k=args.k, search_k=args.search_k, method=args.method,
            ).collect()
            print(json.dumps(
                [{"doc_id": r.doc_id, "bm25": r.bm25, "geo_dist": r.geo_dist,
                  "rank": r.rank} for r in rows]
            ))
        else:
            from geometric_aware_retrieval_v2_spark.operators.index import (
                bm25_topk_indexed,
            )

            rows = bm25_topk_indexed(
                spark, args.index, q, k=args.k, method=args.method
            ).collect()
            print(json.dumps(
                [{"doc_id": r.doc_id, "score": r.score, "rank": r.rank} for r in rows]
            ))
    elif args.cmd == "audit":
        from geometric_aware_retrieval_v2_spark.operators.curvature import (
            forman_curvature,
            node_avg_curvature,
            ollivier_curvature,
        )
        from geometric_aware_retrieval_v2_spark.operators.knn import knn_edges

        edges = knn_edges(spark.read.parquet(args.embeddings), k=args.k)
        # reference geo_audit runs ricci_ollivier(backend="auto"), which in
        # its own environment falls back to Forman (curvature.py:117-142);
        # here BOTH are real — forman stays the default for parity, and
        # --curvature ollivier selects the exact OT implementation
        if args.curvature == "ollivier":
            curv = ollivier_curvature(edges, rounded=False)
        else:
            curv = forman_curvature(edges, rounded=False)
        summary = node_avg_curvature(curv).agg(
            F.round(F.avg("avg_kappa"), 6).alias("mean_kappa"),
            F.round(F.min("avg_kappa"), 6).alias("min_kappa"),
            F.round(F.max("avg_kappa"), 6).alias("max_kappa"),
        ).collect()[0]
        print(json.dumps(summary.asDict()))
    elif args.cmd == "eval":
        from geometric_aware_retrieval_v2_spark.operators.evalops import ndcg_recall

        out = ndcg_recall(
            spark.read.parquet(args.run), spark.read.parquet(args.qrels), k=args.k
        ).agg(F.avg("ndcg").alias("ndcg"), F.avg("recall").alias("recall")).collect()[0]
        print(json.dumps({"ndcg": out.ndcg, "recall": out.recall, "k": args.k}))
    elif args.cmd == "compact":
        # rewrite the postings table into doc-sorted non-overlapping blocks
        # (the deferred physical merge; build_index defaults to the logical
        # concat merge below n_partitions=32), then SWAP it in: write ->
        # validate posting count -> two renames (fs_swap_dir; POSIX cannot
        # atomically swap directories — a crash between the renames is
        # journaled and auto-repaired by the next IndexMeta.load, see
        # manifest.write_swap_journal/recover_swap), and rebuild the
        # dictionary from the new blocks so queries read the compacted
        # layout immediately. Filesystem ops route through pyarrow.fs;
        # rename-less object stores are feature-detected up front and fall
        # back to leaving the output staged (swapped=false).
        import uuid

        from pyspark.sql import functions as F2

        from geometric_aware_retrieval_v2_spark.operators.index import IndexMeta
        from geometric_aware_retrieval_v2_spark.plans.manifest import (
            clear_swap_journal,
            fs_rmdir,
            fs_supports_dir_move,
            fs_swap_dir,
            write_swap_journal,
        )
        from geometric_aware_retrieval_v2_spark.operators.postings import merge_segments

        meta = IndexMeta.load(args.index)
        old_path = f"{args.index}/postings"
        tmp_out = f"{args.index}/postings_compacted"
        compacted = merge_segments(
            spark.read.parquet(old_path),
            n_shards=meta.n_shards,
            block_size=meta.block_size,
            compact=True,
        )
        compacted.write.mode("overwrite").parquet(tmp_out)
        n_old = spark.read.parquet(old_path).agg(F2.sum("n")).collect()[0][0]
        n_new = spark.read.parquet(tmp_out).agg(F2.sum("n")).collect()[0][0]
        if n_new != n_old:
            raise RuntimeError(
                f"compaction lost postings: {n_old} -> {n_new}; not swapping"
            )
        tag = uuid.uuid4().hex[:8]
        # dictionary df = sum(n) per term is invariant under repack, but
        # rebuild it from the new blocks so the pair never diverges; stage
        # it BEFORE either swap so both swaps are pure renames with no
        # Spark job in between
        dict_tmp = f"{args.index}/dictionary_compacted"
        spark.read.parquet(tmp_out).groupBy("term_id").agg(
            F2.sum("n").alias("df")
        ).write.mode("overwrite").parquet(dict_tmp)
        dict_path = f"{args.index}/dictionary"
        if not fs_supports_dir_move(args.index):
            # rename-less object store (e.g. pyarrow S3FileSystem): a
            # directory move would throw AFTER retiring the live dir. Probe
            # BEFORE touching anything and leave the compacted output staged
            # instead — queries keep reading the uncompacted live postings.
            n = spark.read.parquet(tmp_out).count()
            print(json.dumps({
                "compacted_blocks": n, "postings": n_new,
                "swapped": False, "output": tmp_out,
            }))
            if owns_session:
                spark.stop()
            return 0
        # journal the pending swap first: fs_swap_dir's two renames are not
        # atomic, and the journal lets the next IndexMeta.load auto-repair a
        # crash between them (manifest.recover_swap) instead of requiring a
        # manual retired_* rename
        write_swap_journal(args.index, tag, [old_path, dict_path])
        retired = fs_swap_dir(old_path, tmp_out, tag)
        dict_retired = fs_swap_dir(dict_path, dict_tmp, tag)
        fs_rmdir(retired)
        fs_rmdir(dict_retired)
        clear_swap_journal(args.index)
        n = spark.read.parquet(old_path).count()
        print(
            json.dumps(
                {
                    "compacted_blocks": n,
                    "postings": n_new,
                    "swapped": True,
                    "output": old_path,
                }
            )
        )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
