"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its corpus model is a toy List[str]); mandated
by the engine scope. All variants are declarative DataFrame pipelines; the
only hashing primitive is md5 (portable: identical in Spark and DuckDB, so
every operator here is oracle-checkable bit-for-bit).

  * exact_dedup        — sha256(content) hash-groupBy.
  * minhash_signatures — w-shingles -> per-seed min of md5(seed:shingle);
    the min is taken over the HEX STRING ordering, which both engines share,
    avoiding any engine-specific 64-bit hash. Classic MinHash (Broder 1997).
  * lsh_candidate_pairs— band the signature (bands of r rows, bucket =
    md5(joined band)), pairs sharing >=1 bucket, verified with exact
    shingle-set Jaccard (Leskovec et al., MMDS ch.3).
  * simhash            — 60-bit Charikar fingerprint from md5-derived term
    hashes weighted by tf; near-dup pairs by banded hamming<=d search.
  * ngram_jaccard_pairs— exact shingle-join Jaccard (the small-scale oracle
    for MinHash; at 10^12 docs only the LSH path runs).
  * embedding_neardup  — cosine >= threshold pairs (brute force here;
    the IVF path in operators/simsearch.py is the scale variant).

Scale notes: every pipeline is shuffle-on-key + hash-aggregate; the LSH
band join's hot buckets are bounded by band width choice, and the shingle
explode is the same tokenizer-shaped skew the posting builder already
handles (doc-pure salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JACCARD_DECIMALS = 6


def exact_dedup(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """-> (content_sha256, n_dups, rep_doc_id): groups with n_dups >= 2."""
    return (
        docs.groupBy(F.sha2(F.col(content_col), 256).alias("content_sha256"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def _tokens(content_col: str):
    return F.filter(F.split(F.col(content_col), r"\s+"), lambda x: x != "")


def shingles(docs: DataFrame, w: int = 3, content_col: str = "content") -> DataFrame:
    """-> (doc_id, shingle) distinct w-token shingles."""
    toks = _tokens(content_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - w),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(w)]
        ),
    )
    return (
        docs.filter(F.size(toks) >= w)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """-> (doc_id, h0..h{n-1}): per-seed minimum of md5('<seed>:'||shingle),
    compared as hex strings (portable total order)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, n_hashes: int = 16, band_rows: int = 2
) -> DataFrame:
    """-> (doc_a, doc_b) distinct candidate pairs sharing >=1 band bucket."""
    n_bands = n_hashes // band_rows
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col(f"h{b * band_rows + r}") for r in range(band_rows)],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """-> (doc_a, doc_b, jaccard >= threshold) from exact shingle sets."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                JACCARD_DECIMALS,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    w: int = 3,
    n_hashes: int = 16,
    band_rows: int = 2,
    threshold: float = 0.5,
    content_col: str = "content",
) -> DataFrame:
    """Full pipeline: shingle -> minhash -> LSH bands -> verified Jaccard."""
    sh = shingles(docs, w=w, content_col=content_col)
    sigs = minhash_signatures(sh, n_hashes=n_hashes)
    pairs = lsh_candidate_pairs(sigs, n_hashes=n_hashes, band_rows=band_rows)
    return jaccard_verify(pairs, sh, threshold=threshold)


def ngram_jaccard_pairs(
    docs: DataFrame, w: int = 3, threshold: float = 0.5, content_col: str = "content"
) -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold (inverted-join on
    shingle, so only co-shingled pairs are scored — never a cross join)."""
    sh = shingles(docs, w=w, content_col=content_col)
    pairs = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_verify(pairs, sh, threshold=threshold)


SIMHASH_BITS = 60  # 15 md5 hex digits -> portable signed-positive BIGINT


def simhash(tf: DataFrame) -> DataFrame:
    """(doc_id, term, tf) -> (doc_id, simhash): Charikar fingerprint.

    Term hash = first 15 md5 hex digits as a 60-bit int; bit j of the
    fingerprint is 1 iff sum over terms of tf * (bit_j(hash) ? +1 : -1) > 0.

    Shape: ONE hash aggregate with 60 sum columns (one per bit), all
    map-side-combinable, so the shuffle carries one row per (doc, map
    partition) — the earlier explode(sequence(0,59)) formulation pushed 60x
    the tokenize output through two shuffles. The per-bit contribution is
    pure integer codegen; the SQL-shaped explode formulation survives as the
    DuckDB oracle (oracles.simhash_sql), values identical (exact integer
    arithmetic on both sides)."""
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")
    pre = tf.select("doc_id", "tf", h.alias("h"))
    aggs = [
        F.sum(F.expr(f"((shiftright(h, {j}) & 1) * 2 - 1) * tf")).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = pre.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return per_doc.select("doc_id", sim.alias("simhash"))


def simhash_neardup_pairs(
    sim: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """-> (doc_a, doc_b, hamming <= max_hamming) via banded search: two
    fingerprints within hamming d < n_bands must share at least one of
    n_bands disjoint bit-bands exactly (pigeonhole)."""
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id_a, id_b, cos >= threshold): brute-force pairs (small scale);
    the IVF-bucketed variant (simsearch.assign_ivf) bounds the pair fan-out
    at corpus scale."""
    from geometric_aware_retrieval_v2_spark.operators.simsearch import (
        _factored_cos,
        _with_norm,
    )

    # norms factored out of the pair join (each vector is in n-1 pairs;
    # inline cosine re-ran the O(d) norm chain per pair — guide §2.3)
    a = _with_norm(emb.withColumnRenamed(id_col, "id_a"), vec_col, "va", "_na", "id_a")
    b = _with_norm(emb.withColumnRenamed(id_col, "id_b"), vec_col, "vb", "_nb", "id_b")
    cos = _factored_cos("va", "_na", "vb", "_nb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, JACCARD_DECIMALS).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs_ivf(
    emb: DataFrame,
    threshold: float = 0.95,
    every: int | None = None,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    quantizer: str = "stride",
    assign_method: str = "jvm",
) -> DataFrame:
    """Scale path for embedding near-dup: IVF-bucketed candidate generation,
    exact cosine verification only within buckets — the vector analogue of
    the MinHash-LSH band join (never all-pairs).

    Every vector is multi-assigned to its ``nprobe`` nearest coarse cells
    (simsearch.assign_ivf); candidate pairs are generated per cell (the pair
    fan-out is bounded by |corpus| * nprobe^2 / n_cells per cell, a shuffle-
    on-key join, not a BroadcastNestedLoopJoin); candidates are then verified
    with the exact JVM cosine. Recall: two high-cosine vectors share a
    nearest cell with probability rising in nprobe — pytest asserts the
    bucketed pairs cover the brute-force pairs on the test corpus;
    ``embedding_neardup_pairs`` stays the small-scale oracle."""
    from geometric_aware_retrieval_v2_spark.operators.simsearch import (
        _factored_cos,
        _with_norm,
        make_assign,
        make_centroids,
    )

    cents = make_centroids(emb, every, n_cells, quantizer, id_col, vec_col)
    assign = make_assign(emb, cents, nprobe, assign_method, id_col, vec_col)
    cand = (
        assign.select(F.col(id_col).alias("id_a"), "cell")
        .join(assign.select(F.col(id_col).alias("id_b"), "cell"), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # norms factored out of the verification joins (see embedding_neardup_pairs)
    va = _with_norm(emb.withColumnRenamed(id_col, "id_a"), vec_col, "va", "_na", "id_a")
    vb = _with_norm(emb.withColumnRenamed(id_col, "id_b"), vec_col, "vb", "_nb", "id_b")
    cos = _factored_cos("va", "_na", "vb", "_nb")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos, JACCARD_DECIMALS).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
