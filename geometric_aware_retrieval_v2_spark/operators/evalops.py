"""Evaluation operators — every metric the reference's eval package computes,
re-expressed as declarative Spark aggregations (no pytrec_eval, no UDFs).

Reference parity:
  * nDCG@k / recall@k over qrels+run long tables — replaces pytrec_eval
    (/root/reference/geoIR/eval/metrics.py:22-44)
  * graph distribution metrics: mean row entropy -sum(p*ln(p+1e-12)) and
    effective degree 1/mean(sum p^2) of the row-normalized adjacency
    (/root/reference/geoIR/eval/metrics.py:47-52)
  * RARE reference-based fallback: |set(ans) ∩ set(ref)| / max(1, len(ref_words))
    with answer = " ".join(docs)[:1000] (/root/reference/geoIR/eval/rare.py:20-34)
  * MockJudge: substring hits of {fact, reason, evidence, citation} in the
    lowercased answer, /4 (/root/reference/geoIR/eval/judges.py:109-119)
  * aggregation policies mean|majority|max|min (judges.py:126-148)
  * SUD = judge(new) - judge(gt) (/root/reference/geoIR/eval/sud.py:18-42)
  * non-monotonicity score: violations (r_i<r_j & q_i>q_j) / C(n,2)
    (/root/reference/geoIR/eval/advanced.py:36-57)
  * contradiction resilience 1/(1+negations), 7-marker lexicon
    (/root/reference/geoIR/eval/advanced.py:82-101)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_DECIMALS = 6

NEGATION_MARKERS = ["not", "no", "never", "nor", "none", "nobody", "nothing"]
JUDGE_KEYWORDS = ["fact", "reason", "evidence", "citation"]


def graph_distribution_metrics(edges: DataFrame, n_nodes: int) -> DataFrame:
    """Undirected (src, dst, weight) -> one row (entropy, effective_degree).

    Sparse-equivalent of the reference's dense formula: zero entries of the
    row-normalized adjacency contribute exactly 0 to both sums, so only edge
    rows participate; means divide by n_nodes."""
    both = edges.select(F.explode(F.array("src", "dst")).alias("node"), "weight")
    rows = both.groupBy("node").agg(F.sum("weight").alias("row_sum"))
    p = (
        both.join(rows, "node")
        .select("node", (F.col("weight") / (F.col("row_sum") + F.lit(1e-12))).alias("p"))
    )
    per_node = p.groupBy("node").agg(
        (-F.sum(F.col("p") * F.log(F.col("p") + F.lit(1e-12)))).alias("h"),
        F.sum(F.col("p") * F.col("p")).alias("p2"),
    )
    return per_node.agg(
        F.round(F.sum("h") / F.lit(float(n_nodes)), OUT_DECIMALS).alias("entropy"),
        F.round(
            F.lit(1.0) / (F.sum("p2") / F.lit(float(n_nodes))), OUT_DECIMALS
        ).alias("effective_degree"),
    )


def ndcg_recall(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """-> (qid, ndcg, recall) per query.

    run: (qid, doc_id, score); qrels: (qid, doc_id, rel). Rank order pinned
    (score desc, doc_id asc). DCG = sum rel/log2(rank+1) over top-k; IDCG from
    the query's rels sorted desc; recall = relevant-in-top-k / total relevant.
    """
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = run.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    hit = ranked.join(qrels, ["qid", "doc_id"], "inner").filter(F.col("rel") > 0)
    dcg = hit.groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"),
        F.count(F.lit(1)).alias("hits"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wq))
        .filter(F.col("irank") <= k)
        .groupBy("qid")
        .agg(F.sum(F.col("rel") / F.log2(F.col("irank") + F.lit(1.0))).alias("idcg"))
    )
    totals = qrels.filter(F.col("rel") > 0).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    return (
        totals.join(ideal, "qid", "left")
        .join(dcg, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), OUT_DECIMALS
            ).alias("ndcg"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.col("n_rel"),
                OUT_DECIMALS,
            ).alias("recall"),
        )
    )


def _answer_col(docs_col: str = "docs") -> F.Column:
    return F.substring(F.concat_ws(" ", F.col(docs_col)), 1, 1000)


def rare_overlap(cases: DataFrame, id_col: str = "case_id") -> DataFrame:
    """(case_id, docs array<string>, reference string) -> (case_id, rare).

    Reference-based fallback branch of RARE (rare.py:31-32): distinct-token
    overlap of the truncated concatenated answer with the reference, divided
    by the reference's (non-distinct) word count."""
    ans_tokens = F.array_distinct(F.split(_answer_col(), r"\s+"))
    ref_tokens_all = F.split(F.col("reference"), r"\s+")
    overlap = F.size(F.array_intersect(ans_tokens, F.array_distinct(ref_tokens_all)))
    denom = F.greatest(F.lit(1), F.size(ref_tokens_all))
    return cases.select(
        F.col(id_col),
        F.round(overlap.cast("double") / denom, OUT_DECIMALS).alias("rare"),
    )


def _lcs_len(a: list[str], b_arr) -> int:
    """LCS length via the rolling-row DP, vectorized over the reference axis:
    c_i[j] = max(c_{i-1}[j], prefixmax_{j'<=j, b[j']=a[i]} (c_{i-1}[j'-1]+1)).
    The prefix-max closed form replaces the sequential c_i[j-1] dependency
    (any subsequence counted either skips a[i] or matches it at some j'<=j),
    so the inner loop is pure NumPy."""
    import numpy as np

    if len(a) == 0 or len(b_arr) == 0:
        return 0
    prev = np.zeros(len(b_arr) + 1, dtype=np.int64)
    for tok in a:
        cand = np.where(b_arr == tok, prev[:-1] + 1, 0)
        np.maximum.accumulate(cand, out=cand)
        nxt = prev.copy()
        nxt[1:] = np.maximum(prev[1:], cand)
        prev = nxt
    return int(prev[-1])


def rare_rouge(
    cases: DataFrame,
    max_tokens: int | None = None,
    id_col: str = "case_id",
    use_stemmer: bool = False,
) -> DataFrame:
    """(case_id, docs array<string>, reference string) -> (case_id, rouge_l).

    The ROUGE-L branch of RARE (/root/reference/geoIR/eval/rare.py:25-29):
    answer = " ".join(docs)[:1000], score = LCS-based F1 against the
    reference = 2*lcs/(|ans|+|ref|). Tokens are lowercase alphanumeric runs
    (rouge_score's regex contract). ``use_stemmer=True`` matches the
    reference call's ``RougeScorer(..., use_stemmer=True)`` (rare.py:32):
    tokens longer than 3 chars are Porter-stemmed before the LCS, via the
    original published algorithm (functions/stemmer.py; residual deviation
    narrowed to NLTK's extension pool, documented there). The stemmer runs
    inside the same Arrow kernel, deduped per batch vocabulary. Both modes
    are driver-gated: the stemmed gate's oracle re-derives Porter
    INDEPENDENTLY in SQL (oracles.porter_stem_chain_sql), so the two
    from-scratch implementations are pinned bit-equal end-to-end.
    ``max_tokens`` truncates both token sequences (bounds the oracle's DP
    unroll; None = full).

    Tokenization is JVM codegen; only the O(|a|*|b|/word-width) DP runs in
    the Arrow batch kernel."""
    import numpy as np  # noqa: F401  (kernel dependency)

    def tok(c: F.Column) -> F.Column:
        t = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")
        return F.slice(t, 1, max_tokens) if max_tokens else t

    prep = cases.select(
        F.col(id_col), tok(_answer_col()).alias("atoks"), tok(F.col("reference")).alias("rtoks")
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        if use_stemmer:
            from ..functions.stemmer import stem_tokens

        for pdf in batches:
            ids, scores = [], []
            for cid, a, b in zip(pdf[id_col], pdf["atoks"], pdf["rtoks"]):
                a = list(a)
                if use_stemmer:
                    a = stem_tokens(a)
                    b = stem_tokens(b)
                b_arr = np.asarray(b, dtype=object)
                lcs = _lcs_len(a, b_arr)
                denom = len(a) + len(b)
                scores.append(2.0 * lcs / denom if denom and lcs else 0.0)
                ids.append(cid)
            yield pd.DataFrame({id_col: ids, "rouge_l": scores})

    out = prep.mapInPandas(run, schema=f"{id_col} long, rouge_l double")
    return out.withColumn("rouge_l", F.round("rouge_l", OUT_DECIMALS))


def mock_judge(cases: DataFrame, docs_col: str = "docs", id_col: str = "case_id") -> DataFrame:
    """(case_id, docs) -> (case_id, judge_score): MockJudge keyword-hit
    fraction (substring containment, judges.py:115-119)."""
    answer = F.lower(_answer_col(docs_col))
    hits = sum(
        F.when(F.contains(answer, F.lit(kw)), 1).otherwise(0) for kw in JUDGE_KEYWORDS
    )
    return cases.select(
        F.col(id_col),
        F.round(hits.cast("double") / F.lit(len(JUDGE_KEYWORDS)), OUT_DECIMALS).alias(
            "judge_score"
        ),
    )


def aggregate_policy(scores: DataFrame, policy: str, group_col: str = "case_id",
                     score_col: str = "score") -> DataFrame:
    """Judge-ensemble aggregation policies (judges.py:126-148)."""
    s = F.col(score_col)
    if policy == "mean":
        agg = F.avg(s)
    elif policy == "majority":
        agg = F.avg(F.when(s > 0.5, 1.0).otherwise(0.0))
    elif policy == "max":
        agg = F.max(s)
    elif policy == "min":
        agg = F.min(s)
    else:
        raise ValueError(f"Unknown aggregation policy: {policy}")
    return scores.groupBy(group_col).agg(F.round(agg, OUT_DECIMALS).alias("agg_score"))


def sud(cases: DataFrame, id_col: str = "case_id") -> DataFrame:
    """(case_id, gt_docs, new_docs) -> (case_id, sud): MockJudge(new)-MockJudge(gt)."""
    new_s = mock_judge(cases.select(id_col, F.col("new_docs").alias("docs")), id_col=id_col)
    gt_s = mock_judge(cases.select(id_col, F.col("gt_docs").alias("docs")), id_col=id_col)
    return (
        new_s.withColumnRenamed("judge_score", "s_new")
        .join(gt_s.withColumnRenamed("judge_score", "s_gt"), id_col)
        .select(id_col, F.round(F.col("s_new") - F.col("s_gt"), OUT_DECIMALS).alias("sud"))
    )


def non_monotonicity(points: DataFrame) -> DataFrame:
    """(idx, recall, quality) rows -> one row (nms, pairs).

    EXACT reference orientation (advanced.py:52-54): over index pairs i<j,
    a violation is r_i < r_j AND q_i > q_j — one direction only, so the
    metric depends on the input sequence order, which is why idx is part of
    the contract."""
    a = points.select(
        F.col("idx").alias("i"), F.col("recall").alias("ri"), F.col("quality").alias("qi")
    )
    b = points.select(
        F.col("idx").alias("j"), F.col("recall").alias("rj"), F.col("quality").alias("qj")
    )
    pairs = a.join(b, F.col("i") < F.col("j"))
    return pairs.agg(
        F.round(
            F.sum(
                F.when((F.col("ri") < F.col("rj")) & (F.col("qi") > F.col("qj")), 1)
                .otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            OUT_DECIMALS,
        ).alias("nms"),
        F.count(F.lit(1)).alias("pairs"),
    )


def contradiction_resilience(cases: DataFrame, id_col: str = "case_id") -> DataFrame:
    """(case_id, docs array<string>) -> (case_id, core): 1/(1+negation_count),
    whole-word lowercase matches of the 7-marker lexicon across all docs."""
    words = F.split(F.lower(F.concat_ws(" ", F.col("docs"))), r"\s+")
    negs = F.size(F.filter(words, lambda x: x.isin(NEGATION_MARKERS)))
    return cases.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + negs), OUT_DECIMALS).alias("core"),
    )
