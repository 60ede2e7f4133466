#!/usr/bin/env python
"""Round-6 session-3 instrumentation: phase breakdown of the flagship
indexed pipeline (WAND candidates -> embedding join -> geodesic kernel ->
window top-k). NOT the driver bench."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from geometric_aware_retrieval_v2_spark.functions.hashing import encode_queries
    from geometric_aware_retrieval_v2_spark.operators.index import (
        IndexHandle,
        bm25_topk_indexed,
        build_index,
    )
    from geometric_aware_retrieval_v2_spark.operators.pipelines import (
        attach_candidates,
        bm25_geodesic_indexed,
    )
    from geometric_aware_retrieval_v2_spark.operators.rerank import geodesic_rerank
    from geometric_aware_retrieval_v2_spark.queryset import queries_df
    from geometric_aware_retrieval_v2_spark.session import get_spark
    from geometric_aware_retrieval_v2_spark.sources.tables import (
        docs_from_documents,
        load_table,
    )

    spark = get_spark(app_name="flagship-breakdown", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    emb = load_table(spark, SF_DIR, "embeddings")
    doc_idx = tempfile.mkdtemp(prefix="gar2_fb_docidx_")
    shutil.rmtree(doc_idx, ignore_errors=True)
    build_index(spark, docs_from_documents(spark, SF_DIR), doc_idx,
                n_partitions=2, n_shards=8, block_size=128)
    dh = IndexHandle(spark, doc_idx).cache()

    # warm everything once
    bm25_geodesic_indexed(spark, dh, emb, queries_df(spark), k=10,
                          search_k=100).collect()

    out: dict = {}
    for leg in range(3):
        q = queries_df(spark)
        t0 = time.monotonic()
        hits = bm25_topk_indexed(spark, dh, q, k=100, method="wand")
        t1 = time.monotonic()
        qvecs = encode_queries(q, dim=64)
        local = getattr(hits, "_spark_graft_local_topk", None)
        cands = attach_candidates(
            hits, emb, qvecs,
            prune_ids=[r[1] for r in local] if local is not None else None,
        )
        t2 = time.monotonic()
        n = cands.count()  # materialize join only (not what prod runs; timing probe)
        t3 = time.monotonic()
        rr = geodesic_rerank(cands, k=10, connect_k=10, knn_k=10,
                             passthrough=("bm25",))
        rows = rr.collect()
        t4 = time.monotonic()
        out.setdefault("legs", []).append({
            "wand_sec": round(t1 - t0, 4),
            "plan_build_sec": round(t2 - t1, 4),
            "cands_count_sec": round(t3 - t2, 4),
            "rerank_collect_sec": round(t4 - t3, 4),
            "n_cands": n,
            "n_out": len(rows),
        })
    # and the un-probed end-to-end for reference
    legs = []
    for _ in range(3):
        t = time.monotonic()
        bm25_geodesic_indexed(spark, dh, emb, queries_df(spark), k=10,
                              search_k=100).collect()
        legs.append(round(time.monotonic() - t, 4))
    out["flagship_e2e_secs"] = legs
    print(json.dumps(out, indent=2))
    shutil.rmtree(doc_idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
