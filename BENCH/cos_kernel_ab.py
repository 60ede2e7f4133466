#!/usr/bin/env python
"""Round-6 session-3 experiment: JVM higher-order-function cosine vs a
mapInArrow left-fold kernel, on the bench's rerank-pipeline shape (20k x 64
embeddings, 8 queries, cold single shot). Alternating fresh sessions.

The kernel reproduces the JVM fold bit-for-bit: per element j the dot
accumulator does acc = acc + (a_j * b_j) in float64 exactly like
aggregate(zip_with(a, b, *), 0.0, +); norms fold x*x the same way;
cos = dot / (na * nb) with the product rounded once before the divide.

Usage: python BENCH/cos_kernel_ab.py [n_rounds]  (runs old/new per round)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

LEG_SRC = r'''
import sys, time, tempfile, shutil
sys.path.insert(0, "%(repo)s")
import numpy as np, pandas as pd
from pyspark.sql import functions as F
from geometric_aware_retrieval_v2_spark.session import get_spark
from geometric_aware_retrieval_v2_spark.operators.rerank import geodesic_rerank, cosine_topk
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk

MODE = "%(mode)s"
spark = get_spark(app_name="cosab", master="local[32]", shuffle_partitions=32)
emb = spark.read.parquet("%(emb)s")
qvecs = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"))

def kernel_scores(emb, qrows):
    import pyarrow as pa
    qids = np.array([q for q, _ in qrows], dtype=np.int64)
    Q = np.vstack([np.asarray(v, dtype=np.float64) for _, v in qrows])
    nq, d = Q.shape
    accq = np.zeros(nq)
    for j in range(d):
        accq += Q[:, j] * Q[:, j]
    nb = np.sqrt(accq)
    def run(batches):
        for rb in batches:
            tab = pa.Table.from_batches([rb])
            ids = tab.column("vec_id").to_numpy()
            col = tab.column("embedding").combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if len(flat) != len(ids) * d:
                raise NotImplementedError("ragged embedding arrays")
            A = flat.astype(np.float64).reshape(len(ids), d)
            acc = np.zeros((len(ids), nq))
            accn = np.zeros(len(ids))
            for j in range(d):
                acc += A[:, j][:, None] * Q[:, j][None, :]
                accn += A[:, j] * A[:, j]
            na = np.sqrt(accn)
            cos = acc / (na[:, None] * nb[None, :])
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(qids, len(ids))),
                 pa.array(np.tile(ids, nq)),
                 pa.array(cos.ravel(order="F"))],
                names=["qid", "doc_id", "_cos"])
    return emb.select("vec_id", "embedding").mapInArrow(
        run, schema="qid long, doc_id long, _cos double")

def cosine_topk_kernel(emb, qvecs, k):
    qrows = [(r.qid, r.qvec) for r in qvecs.collect()]
    scored = kernel_scores(emb, qrows).select(
        "qid", "doc_id",
        F.round(F.col("_cos"), 9).alias("sim_key"),
        F.round(F.col("_cos"), 6).alias("sim"))
    order = [F.col("sim_key").desc(), F.col("doc_id").desc()]
    return grouped_topk(scored, keys=["qid"], order=order, k=k).select(
        "qid", "doc_id", "sim", "rank")

def full():
    if MODE == "new":
        hits = cosine_topk_kernel(emb, qvecs, k=100)
    else:
        hits = cosine_topk(emb, qvecs, k=100)
    cands = (hits.select("qid","doc_id")
             .join(emb.withColumnRenamed("vec_id","doc_id"), "doc_id")
             .join(qvecs, "qid").select("qid","doc_id","embedding","qvec"))
    return geodesic_rerank(cands, k=10, connect_k=10, knn_k=10)

t = time.monotonic(); rows = full().collect(); cold = time.monotonic()-t
legs = []
for _ in range(3):
    t = time.monotonic(); full().collect(); legs.append(round(time.monotonic()-t,3))
# exactness: compare hit sets between both paths inside the same session
a = sorted(map(tuple, cosine_topk(emb, qvecs, k=100).collect()))
b = sorted(map(tuple, cosine_topk_kernel(emb, qvecs, k=100).collect()))
print('{"mode":"%(mode)s","cold":' + str(round(cold,3)) + ',"warm":' + str(legs)
      + ',"n":' + str(len(rows)) + ',"exact":' + str(a == b).lower() + "}")
spark.stop()
'''


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # build the 20k x 64 table once
    emb_dir = "/tmp/cosab_emb20k"
    if not os.path.isdir(emb_dir):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        rng = np.random.default_rng(0)
        n, d = 20000, 64
        flat = rng.standard_normal(n * d).astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), d).cast(
            pa.list_(pa.float32())
        )
        tab = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                        "embedding": arr})
        os.makedirs(emb_dir, exist_ok=True)
        pq.write_table(tab, f"{emb_dir}/part-0.parquet")
    for rnd in range(n_rounds):
        for mode in ("old", "new"):
            src = LEG_SRC % {"repo": str(REPO), "mode": mode, "emb": emb_dir}
            out = subprocess.run([sys.executable, "-c", src],
                                 capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            print(f"round {rnd}", line[-1] if line else out.stderr[-500:],
                  flush=True)


if __name__ == "__main__":
    main()
