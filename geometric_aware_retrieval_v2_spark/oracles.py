"""DuckDB oracle SQL for every SQL-expressible engine operator.

These strings run against the driver's pre-registered parquet views
(region nation customer supplier part orders lineitem events documents
embeddings) at sf0.01 and must match the Spark DataFrame results by
row-count, schema, and order-insensitive value hash.

Float policy: every computed float column is round()ed to a fixed number of
decimals on BOTH sides so <=1-ulp libm/accumulation-order differences between
the JVM and DuckDB can never flip a hash or a rank (SURVEY.md §4 item 3).
"""

from __future__ import annotations

from geometric_aware_retrieval_v2_spark.queryset import queries_values_sql

K1 = 1.2
B = 0.75

# shared CTA fragments over the documents view -------------------------------

# engine contract: split on \s+ and drop empty tokens — list_filter keeps the
# oracle honest on documents with doubled/leading/trailing whitespace
TOKS = (
    "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term "
    "FROM documents WHERE text IS NOT NULL"
)
TF = f"SELECT doc_id, term, count(*) AS tf FROM ({TOKS}) GROUP BY doc_id, term"
DL = f"SELECT doc_id, count(*) AS doc_len FROM ({TOKS}) GROUP BY doc_id"


def tokenize_tf_sql() -> str:
    return TF


def tokenize_code2_sql() -> str:
    """code2 tokenizer gate: camelCase + snake_case identifiers built from
    each doc's first 5 words, split back by the same two boundary regexes
    the engine uses (functions/tokenizer.py CAMEL_BOUNDARY_1/2)."""
    return r"""
    WITH src AS (
      SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS ws FROM documents
    ),
    ident AS (
      SELECT doc_id,
             list_aggregate(list_transform(ws, w -> upper(w[1]) || w[2:]),
                            'string_agg', '') AS camel,
             array_to_string(ws, '_') AS snake
      FROM src
    ),
    norm AS (
      SELECT doc_id,
             replace(
               regexp_replace(
                 regexp_replace(camel || ' ' || snake,
                                '([a-z0-9])([A-Z])', '\1 \2', 'g'),
                 '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),
               '_', ' ') AS c
      FROM ident
    ),
    toks AS (
      SELECT doc_id,
             lower(unnest(regexp_extract_all(c, '[A-Za-z_][A-Za-z0-9_]*|[0-9]+'))) AS term
      FROM norm
    )
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    """


def doc_stats_sql() -> str:
    return f"""
    SELECT d.doc_id, coalesce(dl.doc_len, 0) AS doc_len, sha256(d.text) AS content_sha256
    FROM documents d LEFT JOIN ({DL}) dl USING (doc_id)
    """


def term_df_sql() -> str:
    return f"SELECT term, count(*) AS df FROM ({TF}) GROUP BY term"


def corpus_stats_sql() -> str:
    return f"""
    SELECT count(*) AS n_docs, round(avg(doc_len::DOUBLE), 6) AS avgdl FROM ({DL})
    """


def bm25_topk_sql(k: int = 10) -> str:
    return f"""
    WITH q AS (SELECT qid::BIGINT AS qid, qtext FROM {queries_values_sql()}),
    qterms AS (SELECT DISTINCT qid, unnest(list_filter(string_split(qtext, ' '), x -> x <> '')) AS term FROM q),
    tf AS ({TF}),
    dl AS ({DL}),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(doc_len::DOUBLE) AS avgdl FROM dl),
    tdf AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qt.qid, tf.doc_id,
             sum(
               ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
               * tf.tf::DOUBLE * ({K1} + 1)
               / (tf.tf::DOUBLE + {K1} * (1 - {B} + {B} * dl.doc_len::DOUBLE / s.avgdl))
             ) AS score
      FROM tf
      JOIN qterms qt USING (term)
      JOIN tdf ON tdf.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY qt.qid, tf.doc_id
    ),
    ranked AS (
      SELECT qid, doc_id, round(score, 6) AS score,
             row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
      FROM scored
    )
    SELECT qid, doc_id, score, rank FROM ranked WHERE rank <= {k}
    """


def tpch_q1_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def top_customers_sql(k: int = 20) -> str:
    return f"""
    WITH rev AS (
      SELECT o.o_custkey AS custkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
             count(DISTINCT o.o_orderkey) AS n_orders
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    ),
    ranked AS (
      SELECT c.c_custkey, c.c_name, r.revenue, r.n_orders,
             row_number() OVER (ORDER BY r.revenue DESC, c.c_custkey ASC) AS rank
      FROM rev r JOIN customer c ON r.custkey = c.c_custkey
    )
    SELECT c_custkey, c_name, revenue, n_orders, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------- geometric

EMB = "SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings"

KNN_EDGES = """
  SELECT src, dst, min(weight) AS weight FROM (
    SELECT least(src, dst) AS src, greatest(src, dst) AS dst, round(dist, 6) AS weight
    FROM (
      SELECT src, dst, dist,
             row_number() OVER (PARTITION BY src ORDER BY round(dist, 9) ASC, dst ASC) AS rn
      FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               1.0 - list_cosine_similarity(a.v, b.v) AS dist
        FROM ({emb}) a JOIN ({emb}) b ON a.vec_id <> b.vec_id
      )
    ) WHERE rn <= {k}
  ) GROUP BY src, dst
""".replace("{emb}", EMB)

FORMAN = """
  SELECT e.src, e.dst,
         {kround} AS kappa
  FROM ({edges}) e
  JOIN (SELECT node, sum(weight) AS strength, sum(1.0/sqrt(weight)) AS rsqrt_sum
        FROM (SELECT src AS node, weight FROM ({edges}) WHERE weight <> 0
              UNION ALL
              SELECT dst AS node, weight FROM ({edges}) WHERE weight <> 0)
        GROUP BY node) su ON e.src = su.node
  JOIN (SELECT node, sum(weight) AS strength, sum(1.0/sqrt(weight)) AS rsqrt_sum
        FROM (SELECT src AS node, weight FROM ({edges}) WHERE weight <> 0
              UNION ALL
              SELECT dst AS node, weight FROM ({edges}) WHERE weight <> 0)
        GROUP BY node) sv ON e.dst = sv.node
  WHERE e.weight <> 0 AND su.strength <> 0 AND sv.strength <> 0
"""


def knn_edges_sql(k: int = 5) -> str:
    return KNN_EDGES.replace("{k}", str(k))


_KAPPA_RAW = (
    "e.weight * (1.0/su.strength + 1.0/sv.strength)"
    " - sqrt(e.weight) * (su.rsqrt_sum - 1.0/sqrt(e.weight))"
    " - sqrt(e.weight) * (sv.rsqrt_sum - 1.0/sqrt(e.weight))"
)


def ollivier_curvature_sql(knn_k: int = 4, cap: int = 4) -> str:
    """Exact Ollivier-Ricci curvature via LP-DUAL ENUMERATION.

    The Spark operator solves each edge's transport problem on the PRIMAL
    side (integer min-cost flow, operators/curvature.py). SQL cannot run a
    flow algorithm, but it can prove the same optimum from the DUAL side:
    with hop costs in {0..3}, Kantorovich duality has an INTEGRAL optimal
    potential f with f[u] = 0 and every f[i] in [-3, 3] (c-concave
    potentials differ by at most the cost range), and for any f the best
    feasible g is g_j = min_i (c_ij - f_i). So

        W1 = max over f in {-3..3}^deg(u) of
             sum_i mu_i f_i + sum_j nu_j min_i (c_ij - f_i)

    — a finite enumeration (7^deg per edge), which is why the gate runs on
    the degree-capped subset (cap=4 -> 2401 assignments/edge; the pytest
    suite covers arbitrary degrees with a brute-force primal twin). Masses
    use the alpha=1/2 integer scaling S = 2*du*dv: mu = [du*dv, dv...],
    nu = [du*dv, du...]. Spark divides by lcm-scaled integers instead —
    the exact rationals are equal, so the correctly-rounded float64
    quotients are bit-identical. Costs: 0 iff same node, 1 iff adjacent,
    2 iff any common neighbor, else exactly 3 (supports are within 1 hop
    of adjacent endpoints, so hop distance never exceeds 3)."""
    if cap != 4:
        raise ValueError("SQL enumeration is generated for cap=4 slots")
    return f"""
    WITH edges AS ({knn_edges_sql(knn_k)}),
    adj AS (
      SELECT src AS node, dst AS nbr FROM edges
      UNION ALL SELECT dst AS node, src AS nbr FROM edges
    ),
    deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
    ed AS (
      SELECT e.src, e.dst, a.d AS du, b.d AS dv
      FROM edges e
      JOIN deg a ON a.node = e.src JOIN deg b ON b.node = e.dst
      WHERE a.d <= {cap} AND b.d <= {cap}
    ),
    supp_u AS (
      SELECT src, dst, src AS x, 0 AS i FROM ed
      UNION ALL
      SELECT e.src, e.dst, a.nbr AS x,
             row_number() OVER (PARTITION BY e.src, e.dst ORDER BY a.nbr) AS i
      FROM ed e JOIN adj a ON a.node = e.src
    ),
    supp_v AS (
      SELECT src, dst, dst AS y, 0 AS j FROM ed
      UNION ALL
      SELECT e.src, e.dst, a.nbr AS y,
             row_number() OVER (PARTITION BY e.src, e.dst ORDER BY a.nbr) AS j
      FROM ed e JOIN adj a ON a.node = e.dst
    ),
    cost AS (
      SELECT su.src, su.dst, su.i, sv.j,
        CASE WHEN su.x = sv.y THEN 0
             WHEN EXISTS (SELECT 1 FROM adj a
                          WHERE a.node = su.x AND a.nbr = sv.y) THEN 1
             WHEN EXISTS (SELECT 1 FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr
                          WHERE a1.node = su.x AND a2.node = sv.y) THEN 2
             ELSE 3 END AS c
      FROM supp_u su JOIN supp_v sv
        ON su.src = sv.src AND su.dst = sv.dst
    ),
    vals AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS fv),
    fa AS (
      SELECT DISTINCT e.src, e.dst,
             list_slice([0, v1.fv, v2.fv, v3.fv, v4.fv], 1, e.du + 1) AS f
      FROM ed e, vals v1, vals v2, vals v3, vals v4
    ),
    gj AS (
      SELECT c.src, c.dst, a.f, c.j, min(c.c - a.f[c.i + 1]) AS g
      FROM cost c JOIN fa a ON a.src = c.src AND a.dst = c.dst
      GROUP BY c.src, c.dst, a.f, c.j
    ),
    duals AS (
      SELECT g.src, g.dst, g.f,
             sum((CASE WHEN g.j = 0 THEN e.du * e.dv ELSE e.du END) * g.g)
               AS nug
      FROM gj g JOIN ed e ON e.src = g.src AND e.dst = g.dst
      GROUP BY g.src, g.dst, g.f
    ),
    best AS (
      SELECT d.src, d.dst,
             max(e.dv * list_aggregate(d.f, 'sum') + d.nug) AS w1s
      FROM duals d JOIN ed e ON e.src = d.src AND e.dst = d.dst
      GROUP BY d.src, d.dst
    )
    SELECT b.src, b.dst,
           round(1.0 - b.w1s / (2.0 * e.du * e.dv), 6) AS kappa
    FROM best b JOIN ed e ON e.src = b.src AND e.dst = b.dst
    """


def forman_curvature_sql(k: int = 5, rounded: bool = True) -> str:
    kexpr = f"round({_KAPPA_RAW}, 6)" if rounded else _KAPPA_RAW
    return FORMAN.replace("{kround}", kexpr).replace("{edges}", knn_edges_sql(k))


def node_curvature_sql(k: int = 5) -> str:
    raw = forman_curvature_sql(k, rounded=False)
    return f"""
    SELECT node, round(avg(kappa), 6) AS avg_kappa FROM (
      SELECT src AS node, kappa FROM ({raw})
      UNION ALL
      SELECT dst AS node, kappa FROM ({raw})
    ) GROUP BY node
    """


def cosine_topk_sql(k: int = 10, n_queries: int = 10) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    s AS (
      SELECT q.qid, e.vec_id AS doc_id, list_cosine_similarity(e.v, q.qv) AS cos
      FROM ({EMB}) e CROSS JOIN q
    ),
    r AS (
      SELECT qid, doc_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id DESC) AS rank
      FROM s
    )
    SELECT qid, doc_id, round(cos, 6) AS sim, rank FROM r WHERE rank <= {k}
    """


def curvature_mix_topk_sql(alpha: float = 0.3, k: int = 10, knn_k: int = 5, n_queries: int = 10) -> str:
    return f"""
    WITH nc AS ({node_curvature_sql(knn_k)}),
    q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    s AS (
      SELECT q.qid, e.vec_id AS doc_id,
             (1.0 - {alpha}) * list_cosine_similarity(e.v, q.qv)
             + {alpha} * coalesce(nc.avg_kappa, 0.0) AS mix
      FROM ({EMB}) e CROSS JOIN q LEFT JOIN nc ON nc.node = e.vec_id
    ),
    r AS (
      SELECT qid, doc_id, mix,
             row_number() OVER (PARTITION BY qid ORDER BY round(mix, 9) DESC, doc_id DESC) AS rank
      FROM s
    )
    SELECT qid, doc_id, round(mix, 6) AS score, rank FROM r WHERE rank <= {k}
    """


def graph_metrics_sql(knn_k: int = 5) -> str:
    return f"""
    WITH e AS ({knn_edges_sql(knn_k)}),
    n AS (SELECT count(*)::DOUBLE AS n_nodes FROM embeddings),
    bidir AS (SELECT src AS node, weight FROM e UNION ALL SELECT dst, weight FROM e),
    rows_ AS (SELECT node, sum(weight) AS row_sum FROM bidir GROUP BY node),
    p AS (SELECT b.node, b.weight / (r.row_sum + 1e-12) AS p
          FROM bidir b JOIN rows_ r ON b.node = r.node),
    per_node AS (
      SELECT node, -sum(p * ln(p + 1e-12)) AS h, sum(p * p) AS p2 FROM p GROUP BY node
    )
    SELECT round(sum(h) / (SELECT n_nodes FROM n), 6) AS entropy,
           round(1.0 / (sum(p2) / (SELECT n_nodes FROM n)), 6) AS effective_degree
    FROM per_node
    """


def ndcg_recall_sql(k: int = 10, n_queries: int = 10, run_k: int = 50) -> str:
    run = cosine_topk_sql(k=run_k, n_queries=n_queries)
    return f"""
    WITH run AS ({run}),
    lbl AS (SELECT vec_id, label FROM embeddings),
    qrels AS (
      SELECT q.vec_id AS qid, d.vec_id AS doc_id, 1 AS rel
      FROM lbl q JOIN lbl d ON q.label = d.label
      WHERE q.vec_id < {n_queries}
    ),
    ranked AS (
      SELECT qid, doc_id, sim AS score,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id ASC) AS rank
      FROM run
    ),
    hit AS (
      SELECT r.qid, sum(qr.rel / log2(r.rank + 1.0)) AS dcg, count(*) AS hits
      FROM ranked r JOIN qrels qr ON r.qid = qr.qid AND r.doc_id = qr.doc_id
      WHERE r.rank <= {k}
      GROUP BY r.qid
    ),
    ideal AS (
      SELECT qid, sum(rel / log2(irank + 1.0)) AS idcg FROM (
        SELECT qid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id ASC) AS irank
        FROM qrels
      ) WHERE irank <= {k} GROUP BY qid
    ),
    totals AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid)
    SELECT t.qid,
           round(coalesce(h.dcg, 0.0) / i.idcg, 6) AS ndcg,
           round(coalesce(h.hits, 0)::DOUBLE / t.n_rel, 6) AS recall
    FROM totals t LEFT JOIN ideal i ON t.qid = i.qid LEFT JOIN hit h ON t.qid = h.qid
    """


def _ppr_steps(iters: int, alpha: float) -> str:
    """Unrolled PPR power iterations p1..p{iters} as chained materialized
    CTEs over `prior` (qid, doc_id, pr) and `anorm` (qid, i, j, a):
    p <- (1-alpha)*prior + alpha * A_norm^T p."""
    steps = []
    for it in range(1, iters + 1):
        steps.append(
            f"""p{it} AS MATERIALIZED (
      SELECT pr.qid, pr.doc_id,
             {1 - alpha} * pr.pr + {alpha} * coalesce(m.v, 0.0) AS p
      FROM prior pr LEFT JOIN (
        SELECT an.qid, an.j AS doc_id, sum(an.a * pk.p) AS v
        FROM anorm an JOIN p{it - 1} pk ON pk.qid = an.qid AND pk.doc_id = an.i
        GROUP BY an.qid, an.j
      ) m ON m.qid = pr.qid AND m.doc_id = pr.doc_id
    )"""
        )
    return ",\n    ".join(steps)


def ppr_rerank_sql(
    n_queries: int = 10,
    topk: int = 50,
    alpha: float = 0.2,
    iters: int = 20,
) -> str:
    """Personalized-PageRank rerank oracle: the 20 power iterations are
    UNROLLED as chained CTEs (p0..p20) — recursive CTEs cannot aggregate in
    DuckDB 1.0, but a fixed iteration count needs no recursion. Mirrors the
    engine kernel exactly: A = clip(cos,0) with zero diagonal over the
    cosine top-k candidates, prior = clamp(sims,1e-6)/sum,
    p <- (1-alpha)*prior + alpha * A_norm^T p."""
    chain = _ppr_steps(iters, alpha)
    return f"""
    WITH q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    cand AS (
      SELECT qid, doc_id FROM (
        SELECT q.qid, e.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(e.v, q.qv), 9) DESC, e.vec_id DESC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN q
      ) WHERE rn <= {topk}
    ),
    sims AS (
      SELECT c.qid, c.doc_id, list_cosine_similarity(e.v, q.qv) AS s
      FROM cand c JOIN ({EMB}) e ON e.vec_id = c.doc_id JOIN q ON q.qid = c.qid
    ),
    prior AS MATERIALIZED (
      SELECT qid, doc_id,
             greatest(s, 1e-6) / sum(greatest(s, 1e-6)) OVER (PARTITION BY qid) AS pr
      FROM sims
    ),
    adj AS (
      SELECT a.qid, a.doc_id AS i, b.doc_id AS j,
             greatest(list_cosine_similarity(ea.v, eb.v), 0.0) AS w
      FROM cand a
      JOIN cand b ON a.qid = b.qid AND a.doc_id <> b.doc_id
      JOIN ({EMB}) ea ON ea.vec_id = a.doc_id
      JOIN ({EMB}) eb ON eb.vec_id = b.doc_id
    ),
    anorm AS MATERIALIZED (
      SELECT qid, i, j, w / (sum(w) OVER (PARTITION BY qid, i) + 1e-12) AS a
      FROM adj
    ),
    p0 AS MATERIALIZED (SELECT qid, doc_id, pr AS p FROM prior),
    {chain}
    SELECT qid, doc_id, round(p, 9) AS ppr,
           row_number() OVER (PARTITION BY qid ORDER BY round(p, 9) DESC, doc_id ASC) AS rank
    FROM p{iters}
    """


def softknn_ppr_sql(
    n_queries: int = 10,
    topk: int = 50,
    knn_k: int = 10,
    alpha: float = 0.2,
    iters: int = 20,
) -> str:
    """PPR over the soft-kNN adjacency — the reference's differentiable graph
    forward semantics (soft_knn_graph_np; /root/reference/geoIR/geo/
    differentiable.py:19-140) re-expressed relationally, step for step:
    squared-L2 cdist on row-normalized embeddings; gamma = P20(D2>0 upper
    tri)/ln(k) (quantile_cont == np.percentile 'linear'); row softmax with
    max-shift; tau-fix rows to mass k; hard top-k threshold at the k-th
    largest (the boundary element is each side's own k-th value, so the kept
    pattern is perturbation-stable); symmetrize (A+A^T)/2; renormalize rows
    to mass k; then the standard unrolled PPR chain."""
    chain = _ppr_steps(iters, alpha)
    return f"""
    WITH q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    cand AS MATERIALIZED (
      SELECT qid, doc_id FROM (
        SELECT q.qid, e.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(e.v, q.qv), 9) DESC, e.vec_id DESC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN q
      ) WHERE rn <= {topk}
    ),
    sims AS (
      SELECT c.qid, c.doc_id, list_cosine_similarity(e.v, q.qv) AS s
      FROM cand c JOIN ({EMB}) e ON e.vec_id = c.doc_id JOIN q ON q.qid = c.qid
    ),
    prior AS MATERIALIZED (
      SELECT qid, doc_id,
             greatest(s, 1e-6) / sum(greatest(s, 1e-6)) OVER (PARTITION BY qid) AS pr
      FROM sims
    ),
    cn AS MATERIALIZED (
      SELECT c.qid, c.doc_id,
             list_transform(e.v, x -> x / sqrt(list_inner_product(e.v, e.v))) AS en
      FROM cand c JOIN ({EMB}) e ON e.vec_id = c.doc_id
    ),
    d2 AS MATERIALIZED (
      SELECT a.qid, a.doc_id AS i, b.doc_id AS j,
             greatest(list_inner_product(a.en, a.en) + list_inner_product(b.en, b.en)
                      - 2 * list_inner_product(a.en, b.en), 0.0) AS d2
      FROM cn a JOIN cn b ON a.qid = b.qid AND a.doc_id <> b.doc_id
    ),
    gam AS MATERIALIZED (
      SELECT qid,
             greatest(coalesce(quantile_cont(d2, 0.2) FILTER (WHERE d2 > 0), 1.0)
                      / ln({max(knn_k, 2)}), 1e-12) AS g
      FROM d2 WHERE i < j GROUP BY qid
    ),
    logits AS (
      SELECT dd.qid, dd.i, dd.j, -dd.d2 / g.g AS lg
      FROM d2 dd JOIN gam g ON g.qid = dd.qid
    ),
    rowmax AS (SELECT qid, i, max(lg) AS mx FROM logits GROUP BY qid, i),
    ex AS MATERIALIZED (
      SELECT l.qid, l.i, l.j, exp(l.lg - r.mx) AS ex
      FROM logits l JOIN rowmax r ON r.qid = l.qid AND r.i = l.i
    ),
    pmat AS (
      SELECT qid, i, j, ex / sum(ex) OVER (PARTITION BY qid, i) AS p FROM ex
    ),
    a1 AS MATERIALIZED (
      SELECT qid, i, j, p * ({knn_k} / sum(p) OVER (PARTITION BY qid, i)) AS a FROM pmat
    ),
    nsz AS (SELECT qid, count(*) AS m FROM cand GROUP BY qid),
    kth AS (
      SELECT qid, i, a AS kv FROM (
        SELECT qid, i, a, row_number() OVER (PARTITION BY qid, i ORDER BY a DESC) AS rn
        FROM a1
      ) WHERE rn = {knn_k}
    ),
    a2 AS (
      SELECT a1.qid, a1.i, a1.j,
             CASE WHEN n.m - 1 <= {knn_k} OR (k.kv IS NOT NULL AND a1.a >= k.kv)
                  THEN a1.a ELSE 0.0 END AS a
      FROM a1
      JOIN nsz n ON n.qid = a1.qid
      LEFT JOIN kth k ON k.qid = a1.qid AND k.i = a1.i
    ),
    asym AS MATERIALIZED (
      SELECT x.qid, x.i, x.j, 0.5 * (x.a + y.a) AS a
      FROM a2 x JOIN a2 y ON y.qid = x.qid AND y.i = x.j AND y.j = x.i
    ),
    rsum AS (SELECT qid, i, sum(a) AS s FROM asym GROUP BY qid, i),
    afin AS MATERIALIZED (
      SELECT x.qid, x.i, x.j, x.a * ({knn_k} / (r.s + 1e-8)) AS w
      FROM asym x JOIN rsum r ON r.qid = x.qid AND r.i = x.i
    ),
    anorm AS MATERIALIZED (
      SELECT qid, i, j, w / (sum(w) OVER (PARTITION BY qid, i) + 1e-12) AS a
      FROM afin
    ),
    p0 AS MATERIALIZED (SELECT qid, doc_id, pr AS p FROM prior),
    {chain}
    SELECT qid, doc_id, round(p, 9) AS ppr,
           row_number() OVER (PARTITION BY qid ORDER BY round(p, 9) DESC, doc_id ASC) AS rank
    FROM p{iters}
    """


def geodesic_rerank_sql(
    n_queries: int = 10,
    search_k: int = 50,
    connect_k: int = 10,
    knn_k: int = 5,
    k: int = 10,
    rounds: int | None = None,
) -> str:
    """Strategy-C geodesic oracle: single-source shortest paths as UNROLLED
    Bellman-Ford rounds (materialized CTEs d0..dR). Exactness: BF's
    d(v) = d(u) + w relaxation uses the same left-to-right float association
    as Dijkstra along the winning path, so distances match bit-for-bit; R =
    search_k - 1 rounds guarantees convergence (a shortest path over m nodes
    has < m hops)."""
    rounds = rounds if rounds is not None else search_k - 1
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""d{r} AS MATERIALIZED (
      SELECT qid, node, min(d) AS d FROM (
        SELECT qid, node, d FROM d{r - 1}
        UNION ALL
        SELECT e.qid, e.dst AS node, dr.d + e.weight AS d
        FROM d{r - 1} dr JOIN bidir e ON e.qid = dr.qid AND e.src = dr.node
      ) GROUP BY qid, node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    cand AS MATERIALIZED (
      SELECT qid, doc_id, cos FROM (
        SELECT q.qid, e.vec_id AS doc_id, list_cosine_similarity(e.v, q.qv) AS cos,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(e.v, q.qv), 9) DESC, e.vec_id DESC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN q
      ) WHERE rn <= {search_k}
    ),
    g AS MATERIALIZED ({knn_edges_sql(knn_k)}),
    induced AS (
      SELECT a.qid, g.src, g.dst, g.weight
      FROM g
      JOIN cand a ON a.doc_id = g.src
      JOIN cand b ON b.qid = a.qid AND b.doc_id = g.dst
    ),
    bidir AS MATERIALIZED (
      SELECT qid, src, dst, weight FROM induced
      UNION ALL
      SELECT qid, dst AS src, src AS dst, weight FROM induced
    ),
    d0 AS MATERIALIZED (
      SELECT qid, doc_id AS node, 1.0 - cos AS d FROM (
        SELECT qid, doc_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id DESC) AS rn
        FROM cand
      ) WHERE rn <= {connect_k}
    ),
    {chain}
    SELECT qid, doc_id, geo_dist, rank FROM (
      SELECT qid, node AS doc_id, round(d, 6) AS geo_dist,
             row_number() OVER (PARTITION BY qid ORDER BY round(d, 6) ASC, node ASC) AS rank
      FROM d{rounds}
    ) WHERE rank <= {k}
    """


def _knnsel_cte(knn_k: int) -> str:
    """Shared fragment: directed candidate-kNN selection within each query's
    candidate set — top knn_k by (round(sim,9) DESC, j DESC), weight = 1-sim
    raw — mirroring rerank._candidate_knn_weights' pinned selection."""
    return f"""
      SELECT qid, i, j, 1.0 - sim AS w FROM (
        SELECT qid, i, j, sim,
               row_number() OVER (PARTITION BY qid, i ORDER BY round(sim, 9) DESC, j DESC) AS rn
        FROM adj
      ) WHERE rn <= {knn_k}
    """


_ADJ_CTE = """
      SELECT a.qid, a.doc_id AS i, b.doc_id AS j,
             list_cosine_similarity(ea.v, eb.v) AS sim
      FROM cand a JOIN cand b ON a.qid = b.qid AND a.doc_id <> b.doc_id
      JOIN ({emb}) ea ON ea.vec_id = a.doc_id
      JOIN ({emb}) eb ON eb.vec_id = b.doc_id
""".replace("{emb}", EMB)


def heat_kernel_rerank_sql(
    n_queries: int = 10,
    topk: int = 50,
    t: float = 1.0,
    steps: int = 10,
    knn_k: int = 10,
    k: int = 50,
) -> str:
    """Heat-kernel rerank oracle: K_t = exp(-t L_norm) by the SAME Taylor/
    Horner accumulation as the engine kernel (rerank.heat_kernel_distances_np),
    with each matrix power UNROLLED as a materialized join-aggregate CTE.
    d(anchor, j) = ||K_t[anchor] - K_t[j]||^2; anchor = top-cosine candidate.
    Sub-ulp summation-order diffs vs BLAS are absorbed by the 9dp rounding."""
    sq = "(coalesce(ka.kv, 0.0) - coalesce(kj.kv, 0.0))"
    terms = []
    for s in range(1, steps + 1):
        terms.append(
            f"""term{s} AS MATERIALIZED (
      SELECT tt.qid, tt.i, m.j, sum(tt.v * m.mv) / {s} AS v
      FROM term{s - 1} tt JOIN mmat m ON m.qid = tt.qid AND m.i = tt.j
      GROUP BY tt.qid, tt.i, m.j
    )"""
        )
    chain = ",\n    ".join(terms)
    ksum = " UNION ALL ".join(
        f"SELECT qid, i, j, v FROM term{s}" for s in range(0, steps + 1)
    )
    return f"""
    WITH q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    cand AS MATERIALIZED (
      SELECT qid, doc_id, cos FROM (
        SELECT q.qid, e.vec_id AS doc_id, list_cosine_similarity(e.v, q.qv) AS cos,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(e.v, q.qv), 9) DESC, e.vec_id DESC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN q
      ) WHERE rn <= {topk}
    ),
    adj AS ({_ADJ_CTE}),
    knnsel AS ({_knnsel_cte(knn_k)}),
    aedges AS MATERIALIZED (
      SELECT DISTINCT qid, i AS src, j AS dst, w AS weight FROM (
        SELECT qid, i, j, w FROM knnsel
        UNION ALL SELECT qid, j AS i, i AS j, w FROM knnsel
      )
    ),
    deg AS (SELECT qid, src AS node, sum(weight) AS deg FROM aedges GROUP BY qid, src),
    dinv AS (SELECT qid, node, 1.0 / sqrt(deg + 1e-8) AS dv FROM deg),
    lrows AS (
      SELECT qid, src AS i, dst AS j, -weight AS lv FROM aedges
      UNION ALL
      SELECT qid, node AS i, node AS j, deg AS lv FROM deg
    ),
    mmat AS MATERIALIZED (
      SELECT l.qid, l.i, l.j, -({t}) * ((di.dv * l.lv) * dj.dv) AS mv
      FROM lrows l
      JOIN dinv di ON di.qid = l.qid AND di.node = l.i
      JOIN dinv dj ON dj.qid = l.qid AND dj.node = l.j
    ),
    term0 AS MATERIALIZED (SELECT qid, doc_id AS i, doc_id AS j, 1.0 AS v FROM cand),
    {chain},
    kmat AS MATERIALIZED (
      SELECT qid, i, j, sum(v) AS kv FROM ({ksum}) GROUP BY qid, i, j
    ),
    anchor AS (
      SELECT qid, doc_id AS anode FROM (
        SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id DESC) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    heat AS (
      SELECT jj.qid, jj.doc_id, sum({sq} * {sq}) AS hd
      FROM cand jj
      JOIN anchor an ON an.qid = jj.qid
      JOIN cand c ON c.qid = jj.qid
      LEFT JOIN kmat ka ON ka.qid = jj.qid AND ka.i = an.anode AND ka.j = c.doc_id
      LEFT JOIN kmat kj ON kj.qid = jj.qid AND kj.i = jj.doc_id AND kj.j = c.doc_id
      GROUP BY jj.qid, jj.doc_id
    )
    SELECT qid, doc_id, heat_dist, rank FROM (
      SELECT qid, doc_id, round(hd, 9) AS heat_dist,
             row_number() OVER (PARTITION BY qid ORDER BY round(hd, 9) ASC, doc_id ASC) AS rank
      FROM heat
    ) WHERE rank <= {k}
    """


def bm25_geodesic_sql(
    k: int = 10,
    search_k: int = 50,
    connect_k: int = 10,
    knn_k: int = 10,
    dim: int = 64,
    rounds: int | None = None,
) -> str:
    """Flagship (north-star) oracle: exhaustive BM25 top-search_k -> hashing
    query encoder -> dense candidate k-NN graph -> Bellman-Ford geodesic.

    The md5 feature-hashing encoder (functions/hashing.embed_text) is
    re-expressed exactly: h = little-endian uint64 of md5(tok)[:8], so for
    dim=64 the dimension is digest byte 0 mod 64 (= first hex pair) and the
    sign bit (h >> 8) & 1 is digest byte 1 mod 2 (= second hex pair). The
    query vector's entries are exact small integers, so its construction is
    bit-identical; normalization cancels inside list_cosine_similarity up to
    ulps absorbed by the 9dp rank keys."""
    rounds = rounds if rounds is not None else search_k - 1
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""d{r} AS MATERIALIZED (
      SELECT qid, node, min(d) AS d FROM (
        SELECT qid, node, d FROM d{r - 1}
        UNION ALL
        SELECT e.qid, e.dst AS node, dr.d + e.weight AS d
        FROM d{r - 1} dr JOIN bidir e ON e.qid = dr.qid AND e.src = dr.node
      ) GROUP BY qid, node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH q AS (SELECT qid::BIGINT AS qid, qtext FROM {queries_values_sql()}),
    qterms AS (SELECT DISTINCT qid, unnest(list_filter(string_split(qtext, ' '), x -> x <> '')) AS term FROM q),
    tf AS ({TF}),
    dl AS ({DL}),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(doc_len::DOUBLE) AS avgdl FROM dl),
    tdf AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qt.qid, tf.doc_id,
             sum(
               ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
               * tf.tf::DOUBLE * ({K1} + 1)
               / (tf.tf::DOUBLE + {K1} * (1 - {B} + {B} * dl.doc_len::DOUBLE / s.avgdl))
             ) AS score
      FROM tf
      JOIN qterms qt USING (term)
      JOIN tdf ON tdf.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY qt.qid, tf.doc_id
    ),
    hits AS MATERIALIZED (
      SELECT qid, doc_id, score FROM (
        SELECT qid, doc_id, round(score, 6) AS score,
               row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC) AS rn
        FROM scored
      ) WHERE rn <= {search_k}
    ),
    qtok AS (SELECT qid, unnest(list_filter(string_split(qtext, ' '), x -> x <> '')) AS tok FROM q),
    qhash AS (
      SELECT qid,
             ('0x' || substr(md5(tok), 1, 2))::INT % {dim} AS d,
             CASE WHEN ('0x' || substr(md5(tok), 3, 2))::INT % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
      FROM qtok
    ),
    qdim AS (
      SELECT qq.qid, gs.d, coalesce(sum(qh.s), 0.0) AS val
      FROM q qq
      CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS d) gs
      LEFT JOIN qhash qh ON qh.qid = qq.qid AND qh.d = gs.d
      GROUP BY qq.qid, gs.d
    ),
    qvec AS MATERIALIZED (
      SELECT qid, list(val ORDER BY d) AS qv, sqrt(sum(val * val)) AS qn
      FROM qdim GROUP BY qid
    ),
    cand AS MATERIALIZED (
      SELECT h.qid, h.doc_id, h.score AS bm25,
             CASE WHEN v.qn = 0 THEN 0.0 ELSE list_cosine_similarity(e.v, v.qv) END AS cos
      FROM hits h
      JOIN ({EMB}) e ON e.vec_id = h.doc_id
      JOIN qvec v ON v.qid = h.qid
    ),
    adj AS ({_ADJ_CTE}),
    knnsel AS ({_knnsel_cte(knn_k)}),
    bidir AS MATERIALIZED (
      SELECT DISTINCT qid, i AS src, j AS dst, w AS weight FROM (
        SELECT qid, i, j, w FROM knnsel
        UNION ALL SELECT qid, j AS i, i AS j, w FROM knnsel
      )
    ),
    d0 AS MATERIALIZED (
      SELECT qid, doc_id AS node, 1.0 - cos AS d FROM (
        SELECT qid, doc_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id DESC) AS rn
        FROM cand
      ) WHERE rn <= {connect_k}
    ),
    {chain}
    SELECT f.qid, f.doc_id, c.bm25, f.geo_dist, f.rank FROM (
      SELECT qid, node AS doc_id, round(d, 6) AS geo_dist,
             row_number() OVER (PARTITION BY qid ORDER BY round(d, 6) ASC, node ASC) AS rank
      FROM d{rounds}
    ) f
    JOIN cand c ON c.qid = f.qid AND c.doc_id = f.doc_id
    WHERE f.rank <= {k}
    """


def media_features_sql() -> str:
    """Byte-statistics features over the synthesized media payloads (utf-8
    bytes of the ascii documents text, so code points == bytes)."""
    return """
    WITH b AS (
      SELECT doc_id AS media_id,
             list_transform(string_split(text, ''), x -> ascii(x)) AS bytes
      FROM documents
    ),
    m AS (
      SELECT media_id,
             len(bytes)::BIGINT AS n_bytes,
             (CASE WHEN len(bytes) = 0 THEN -1 ELSE bytes[1] END)::INT AS first_byte,
             (list_sum(bytes) % 1000003)::BIGINT AS byte_sum_mod,
             greatest(1, len(bytes))::DOUBLE AS tot,
             len(list_filter(bytes, x -> x // 64 = 0))::DOUBLE AS c0,
             len(list_filter(bytes, x -> x // 64 = 1))::DOUBLE AS c1,
             len(list_filter(bytes, x -> x // 64 = 2))::DOUBLE AS c2,
             len(list_filter(bytes, x -> x // 64 = 3))::DOUBLE AS c3
      FROM b
    )
    SELECT media_id, n_bytes, first_byte, byte_sum_mod,
           round(c0 / tot, 6) AS hist_0,
           round(c1 / tot, 6) AS hist_1,
           round(c2 / tot, 6) AS hist_2,
           round(c3 / tot, 6) AS hist_3
    FROM m
    """


# ------------------------------------------------------ dedup / simsearch

SHINGLES = """
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(0, len(t)-3),
                  i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS shingle
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents)
    WHERE len(t) >= 3
  )
"""

_J_VERIFY = """
  SELECT p.doc_a, p.doc_b,
         round(p.n_common::DOUBLE / (sa.n_sh + sb.n_sh - p.n_common), 6) AS jaccard
  FROM ({pairs_counted}) p
  JOIN (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id) sa ON p.doc_a = sa.doc_id
  JOIN (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id) sb ON p.doc_b = sb.doc_id
"""


def dedup_exact_sql(n_injected: int = 5, id_offset: int = 10_000_000) -> str:
    """The sf fixtures contain near-dups but NO exact dups, so a bare gate
    passes vacuously on 0 == 0 rows. Both sides therefore union in copies of
    the first ``n_injected`` documents under shifted ids — the gate then
    verifies non-empty (content_sha256, n_dups, rep_doc_id) output."""
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {id_offset} AS doc_id, text
      FROM documents WHERE doc_id < {n_injected}
    )
    SELECT sha256(text) AS content_sha256, count(*) AS n_dups, min(doc_id) AS rep_doc_id
    FROM corpus GROUP BY 1 HAVING count(*) >= 2
    """


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    pairs_counted = """
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    """
    return (
        f"WITH sh AS ({SHINGLES}) "
        f"SELECT doc_a, doc_b, jaccard FROM ({_J_VERIFY.format(pairs_counted=pairs_counted)})"
        f" WHERE jaccard >= {threshold}"
    )


def minhash_lsh_sql(n_hashes: int = 16, band_rows: int = 2, threshold: float = 0.5) -> str:
    mins = ", ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(n_hashes)
    )
    n_bands = n_hashes // band_rows
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs".format(
            b=b,
            cols=" || '|' || ".join(
                f"h{b * band_rows + r}" for r in range(band_rows)
            ),
        )
        for b in range(n_bands)
    )
    pairs_counted = """
      SELECT cp.doc_a, cp.doc_b, count(*) AS n_common
      FROM cand_pairs cp
      JOIN sh a ON a.doc_id = cp.doc_a
      JOIN sh b ON b.doc_id = cp.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    """
    return f"""
    WITH sh AS ({SHINGLES}),
    sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({band_selects}),
    cand_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM ({_J_VERIFY.format(pairs_counted=pairs_counted)})
    WHERE jaccard >= {threshold}
    """


SIMHASH = """
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)::BIGINT AS simhash
  FROM (
    SELECT doc_id, j, sum((((h >> j) & 1) * 2 - 1) * tf) AS s
    FROM (
      SELECT doc_id, term, count(*) AS tf,
             ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents)
      GROUP BY doc_id, term
    ) CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j)
    GROUP BY doc_id, j
  ) GROUP BY doc_id
"""


def simhash_sql() -> str:
    return SIMHASH


def simhash_neardup_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    width = 60 // n_bands
    mask = (1 << width) - 1
    band_exprs = ", ".join(
        f"[{b}::BIGINT, (simhash >> {b * width}) & {mask}]" for b in range(n_bands)
    )
    return f"""
    WITH sim AS ({SIMHASH}),
    bands AS (
      SELECT doc_id, simhash, bk[1] AS band, bk[2] AS key FROM (
        SELECT doc_id, simhash, unnest([{band_exprs}]) AS bk FROM sim
      )
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos
    FROM ({EMB}) a JOIN ({EMB}) b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
    """


_IVF_ASSIGN_CTE = """
    cents AS (
      SELECT (vec_id / {every})::BIGINT AS cell, v AS cvec
      FROM ({emb}) WHERE vec_id % {every} = 0
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cvec), 9) DESC, c.cell ASC
               ) AS rn
        FROM ({emb}) e CROSS JOIN cents c
      ) WHERE rn <= {nprobe}
    )
""".replace("{emb}", EMB)


def knn_edges_ivf_sql(k: int = 5, every: int = 50, nprobe: int = 3) -> str:
    """IVF-bucketed approximate kNN graph oracle — mirrors knn.knn_edges_ivf
    (same tie-breaks and undirected dedup as the exact KNN_EDGES oracle,
    restricted to co-assigned candidates)."""
    assign = _IVF_ASSIGN_CTE.format(every=every, nprobe=nprobe)
    return f"""
    WITH {assign},
    cand AS (
      SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT c.src, c.dst, 1.0 - list_cosine_similarity(ea.v, eb.v) AS dist
      FROM cand c
      JOIN ({EMB}) ea ON ea.vec_id = c.src
      JOIN ({EMB}) eb ON eb.vec_id = c.dst
    ),
    sel AS (
      SELECT src, dst, dist FROM (
        SELECT src, dst, dist,
               row_number() OVER (PARTITION BY src ORDER BY round(dist, 9) ASC, dst ASC) AS rn
        FROM scored
      ) WHERE rn <= {k}
    )
    SELECT src, dst, min(weight) AS weight FROM (
      SELECT least(src, dst) AS src, greatest(src, dst) AS dst, round(dist, 6) AS weight
      FROM sel
    ) GROUP BY src, dst
    """


def embedding_neardup_ivf_sql(
    threshold: float = 0.4, every: int = 50, nprobe: int = 3
) -> str:
    """IVF-bucketed near-dup oracle: nprobe-multi-assignment, pairs within
    shared cells, exact cosine verify — mirrors dedup.embedding_neardup_pairs_ivf."""
    return f"""
    WITH cents AS (
      SELECT (vec_id / {every})::BIGINT AS cell, v AS cvec
      FROM ({EMB}) WHERE vec_id % {every} = 0
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cvec), 9) DESC, c.cell ASC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN cents c
      ) WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
    FROM cand
    JOIN ({EMB}) ea ON ea.vec_id = cand.id_a
    JOIN ({EMB}) eb ON eb.vec_id = cand.id_b
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {threshold}
    """


def ivf_topk_sql(
    every: int | None = 50,
    nprobe: int = 2,
    k: int = 10,
    n_queries: int = 10,
    n_cells: int | None = None,
) -> str:
    """``every``: fixed stride (centroids_every twin). ``n_cells``: derive the
    stride from the corpus count IN SQL — ceil(n / n_cells), the
    centroids_fixed identity — so the fixed-quantizer gate tracks any sf
    instead of hardcoding the sf0.01 stride."""
    if n_cells is not None:
        stride = (
            f"(SELECT CAST(CEIL(COUNT(*) * 1.0 / {n_cells}) AS BIGINT) "
            f"FROM ({EMB}))"
        )
    else:
        stride = str(every)
    return f"""
    WITH cents AS (
      SELECT (vec_id / {stride})::BIGINT AS cell, v AS cvec
      FROM ({EMB}) WHERE vec_id % {stride} = 0
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cvec), 9) DESC, c.cell ASC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    qcells AS (
      SELECT qid, cell FROM (
        SELECT q.qid, c.cell,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 9) DESC, c.cell ASC
               ) AS rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT qc.qid, a.vec_id AS doc_id, list_cosine_similarity(e.v, q.qv) AS cos
      FROM qcells qc
      JOIN assign a ON a.cell = qc.cell
      JOIN ({EMB}) e ON e.vec_id = a.vec_id
      JOIN q ON q.qid = qc.qid
    )
    SELECT qid, doc_id, round(cos, 6) AS sim, rank FROM (
      SELECT qid, doc_id, cos,
             row_number() OVER (
               PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _norm_list(col: str) -> str:
    """L2-normalize a DOUBLE[] in SQL — the float64 renormalize both the
    Lloyd kernel (np.linalg.norm) and the centroid update perform."""
    return (
        f"list_transform({col}, x -> x / sqrt(list_sum("
        f"list_transform({col}, y -> y * y))))"
    )


def _lloyd_iter_cte(i: int) -> str:
    """One unrolled Lloyd iteration: assignment against c{i} (the same
    (round(cos,9) DESC, cell ASC) key the kernel's rounded argmax uses),
    per-(cell, dim) sum of the assigned normalized vectors, re-list, then
    renormalize — empty cells keep c{i}'s centroid via the LEFT JOIN
    coalesce, mirroring kmeans_centroids' newC = C.copy()."""
    return f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.vn, c.cvec), 9) DESC,
                          c.cell ASC
               ) AS rn
        FROM en e CROSS JOIN c{i} c
      ) WHERE rn = 1
    ),
    s{i} AS MATERIALIZED (
      SELECT cell, pos, sum(val) AS s FROM (
        SELECT a.cell, unnest(e.vn) AS val, unnest(range(len(e.vn))) AS pos
        FROM a{i} a JOIN en e USING (vec_id)
      ) GROUP BY cell, pos
    ),
    m{i} AS MATERIALIZED (
      SELECT cell, list(s ORDER BY pos) AS svec FROM s{i} GROUP BY cell
    ),
    c{i + 1} AS MATERIALIZED (
      SELECT p.cell, coalesce({_norm_list("m.svec")}, p.cvec) AS cvec
      FROM c{i} p LEFT JOIN m{i} m USING (cell)
    )"""


def ivf_topk_kmeans_sql(
    n_cells: int = 16,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 10,
    n_queries: int = 10,
) -> str:
    """Oracle for ivf_topk over kmeans_centroids(init='stride', iters=N):
    the Lloyd iterations unrolled as materialized CTEs (the 20-step PPR
    unroll proved the pattern). Init = the centroids_fixed stride picks,
    L2-normalized; each iteration assigns every normalized vector to its
    nearest centroid on the (round(cos,9) DESC, cell ASC) key and replaces
    each non-empty cell's centroid with the normalized mean of its members.
    The final probe/score stage is the standard ivf_topk oracle against the
    learned centroid table."""
    iter_ctes = ",".join(_lloyd_iter_cte(i) for i in range(iters))
    cf = f"c{iters}"
    return f"""
    WITH st AS (
      SELECT CAST(CEIL(COUNT(*) * 1.0 / {n_cells}) AS BIGINT) AS stride
      FROM ({EMB})
    ),
    en AS MATERIALIZED (
      SELECT vec_id, {_norm_list("v")} AS vn FROM ({EMB})
    ),
    c0 AS MATERIALIZED (
      SELECT (e.vec_id / st.stride)::BIGINT AS cell, {_norm_list("e.v")} AS cvec
      FROM ({EMB}) e, st WHERE e.vec_id % st.stride = 0
    ),
    {iter_ctes},
    q AS (SELECT vec_id AS qid, v AS qv FROM ({EMB}) WHERE vec_id < {n_queries}),
    assign AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(e.v, c.cvec), 9) DESC,
                          c.cell ASC
               ) AS rn
        FROM ({EMB}) e CROSS JOIN {cf} c
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT qid, cell FROM (
        SELECT q.qid, c.cell,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 9) DESC,
                          c.cell ASC
               ) AS rn
        FROM q CROSS JOIN {cf} c
      ) WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT qc.qid, a.vec_id AS doc_id, list_cosine_similarity(e.v, q.qv) AS cos
      FROM qcells qc
      JOIN assign a ON a.cell = qc.cell
      JOIN ({EMB}) e ON e.vec_id = a.vec_id
      JOIN q ON q.qid = qc.qid
    )
    SELECT qid, doc_id, round(cos, 6) AS sim, rank FROM (
      SELECT qid, doc_id, cos,
             row_number() OVER (
               PARTITION BY qid ORDER BY round(cos, 9) DESC, doc_id ASC
             ) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ------------------------------------------------------------ text analysis

_LEX = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_id_sql() -> str:
    counts = ", ".join(
        "len(list_filter(toks, x -> x IN ({lst}))) AS c_{lang}".format(
            lst=", ".join(f"'{w}'" for w in _LEX[lang]), lang=lang
        )
        for lang in sorted(_LEX)
    )
    langs = sorted(_LEX)
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    pred = "CASE WHEN {best} <= 0 THEN 'und' ".format(best=best)
    for lang in langs:
        pred += f"WHEN c_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    c AS (SELECT doc_id, {counts} FROM t)
    SELECT doc_id, {pred} AS lang_pred, {best}::BIGINT AS lang_hits FROM c
    """


def quality_score_sql() -> str:
    stops = sorted({w for ws in _LEX.values() for w in ws})
    lst = ", ".join(f"'{w}'" for w in stops)
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n,
             len(list_filter(toks, x -> x IN ({lst})))::DOUBLE / greatest(1, len(toks)) AS stop_ratio,
             (length(text) - (len(toks) - 1))::DOUBLE / greatest(1, len(toks)) AS mean_len
      FROM t
    )
    SELECT doc_id, n::BIGINT AS n_tokens,
           round(stop_ratio, 6) AS stopword_ratio,
           round(mean_len, 6) AS mean_token_len,
           round((least(1.0, n / 100.0)
                  + (1.0 - least(1.0, stop_ratio * 5))
                  + (CASE WHEN mean_len >= 3 AND mean_len <= 12 THEN 1.0 ELSE 0.5 END)) / 3,
                 6) AS quality
    FROM m
    """


def token_stats_sql() -> str:
    return """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, len(toks)::BIGINT AS n_tokens,
           len(list_distinct(toks))::BIGINT AS n_distinct,
           round(len(list_distinct(toks))::DOUBLE / greatest(1, len(toks)), 6) AS type_token_ratio
    FROM t
    """


def doc_fingerprint_sql() -> str:
    return """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(toks, x -> ('0x' || substr(md5(x), 1, 7))::BIGINT % 2147483647)),
             (acc, x) -> (acc * 131 + x) % 2147483647
           ) AS fingerprint
    FROM t
    """


def media_stats_sql() -> str:
    return """
    SELECT doc_id AS media_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           (floor(length(text) / 256) + 1)::INT AS n_frames
    FROM documents
    """


# ------------------------------------------------------------- eval metrics

JUDGE_CASES = """
  SELECT doc_id AS case_id,
         [text, CASE WHEN doc_id % 3 = 0 THEN 'fact evidence'
                     WHEN doc_id % 3 = 1 THEN 'reason citation with evidence'
                     ELSE '' END] AS docs
  FROM documents WHERE doc_id < 200
"""

_JUDGE_SCORE = """
  (
    (CASE WHEN contains(answer, 'fact') THEN 1 ELSE 0 END) +
    (CASE WHEN contains(answer, 'reason') THEN 1 ELSE 0 END) +
    (CASE WHEN contains(answer, 'evidence') THEN 1 ELSE 0 END) +
    (CASE WHEN contains(answer, 'citation') THEN 1 ELSE 0 END)
  )::DOUBLE / 4
"""


def judge_policies_sql() -> str:
    """3-judge ensemble scores aggregated under every reference policy
    (mean/majority/max/min, judges.py:126-148) + meta-eval mean."""
    judges = []
    for j in range(3):
        judges.append(f"""
        SELECT doc_id AS case_id,
               lower(substr(text || ' ' || (CASE (doc_id + {j}) % 3
                 WHEN 0 THEN 'fact evidence' WHEN 1 THEN 'reason citation' ELSE 'citation' END),
                 1, 1000)) AS answer
        FROM documents WHERE doc_id < 100""")
    scores = " UNION ALL ".join(
        f"SELECT case_id, {_JUDGE_SCORE} AS score FROM ({jq} ) t" for jq in judges
    )
    pol = []
    for name, expr in [
        ("mean", "avg(score)"),
        ("majority", "avg(CASE WHEN score > 0.5 THEN 1.0 ELSE 0.0 END)"),
        ("max", "max(score)"),
        ("min", "min(score)"),
    ]:
        pol.append(
            f"SELECT case_id, '{name}' AS policy, round({expr}, 6) AS agg_score "
            f"FROM scores GROUP BY case_id"
        )
    return f"WITH scores AS ({scores})\n" + " UNION ALL ".join(pol)


def rare_sql() -> str:
    return """
    WITH cases AS (
      SELECT a.doc_id AS case_id, [a.text] AS docs, b.text AS reference
      FROM documents a JOIN documents b ON b.doc_id = (a.doc_id + 7) % 500
      WHERE a.doc_id < 100
    ),
    t AS (
      SELECT case_id,
             substr(array_to_string(docs, ' '), 1, 1000) AS answer,
             reference
      FROM cases
    )
    SELECT case_id,
           round(len(list_intersect(list_distinct(string_split(answer, ' ')),
                                    list_distinct(string_split(reference, ' '))))::DOUBLE
                 / greatest(1, len(string_split(reference, ' '))), 6) AS rare
    FROM t
    """


# ---------------------------------------------------------------- Porter/SQL
# An INDEPENDENT re-derivation of the original 1980 Porter algorithm in
# DuckDB SQL (CASE/regexp CTE chain over the distinct token vocabulary),
# used by the rare_rouge_stemmed gate so the Python kernel
# (functions/stemmer.py) is verified against a second from-scratch
# implementation, not just the paper's printed vectors. The consonant/
# vowel pattern trick: mark aeiou as v, then one GLOBAL left-to-right
# regexp pass ([^v])y -> \1v reproduces the paper's sequential
# "y is a vowel iff preceded by a consonant" rule exactly (matches are
# non-overlapping consecutive pairs, i.e. the alternation itself), then
# every remaining char is a consonant. m = #(vc substrings in pattern).


def _p_pat(e: str) -> str:
    """Marks MUST be outside the token alphabet ([a-z0-9]): lowercase v/c
    would collide with the letters v/c and corrupt the ([^V])y pass."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        + e
        + ", '[aeiou]', 'V', 'g'), '([^V])y', '\\1V', 'g'), '[^V]', 'C', 'g')"
    )


def _p_m(e: str) -> str:
    p = _p_pat(e)
    return f"((length({p}) - length(replace({p}, 'VC', ''))) // 2)"


def _p_hasv(e: str) -> str:
    return f"({_p_pat(e)} LIKE '%V%')"


def _p_dd(e: str) -> str:
    """*d: ends in a double consonant."""
    return (
        f"(length({e}) >= 2 AND substr({e}, length({e}) - 1, 1) = "
        f"substr({e}, length({e}), 1) AND {_p_pat(e)} LIKE '%C')"
    )


def _p_cvc(e: str) -> str:
    """*o: ends cvc where the final consonant is not w, x or y."""
    return (
        f"(length({e}) >= 3 AND {_p_pat(e)} LIKE '%CVC' AND "
        f"substr({e}, length({e}), 1) NOT IN ('w', 'x', 'y'))"
    )


def _p_drop(e: str, n: int) -> str:
    return f"substr({e}, 1, length({e}) - {n})"


_P_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_P_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_P_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _p_replace_case(rules: list[tuple[str, str]], cond: str) -> str:
    """Longest-match-first CASE: suffixes ordered by length descending, and
    a failed measure condition leaves the word UNCHANGED (the paper's
    no-fallthrough rule), hence the inner CASE per suffix."""
    whens = []
    for suf, rep in sorted(rules, key=lambda r: -len(r[0])):
        stem = _p_drop("w", len(suf))
        whens.append(
            f"WHEN w LIKE '%{suf}' THEN (CASE WHEN {cond.format(stem=stem)} "
            f"THEN {stem} || '{rep}' ELSE w END)"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def porter_stem_chain_sql(vocab: str) -> str:
    """CTE chain stemming `vocab(tok)` (tokens already lowercase) to
    pstem(tok, stem), one column transformation per paper step. Callers gate
    which tokens enter `vocab` (rouge_score stems only len > 3; that gate
    also subsumes the paper's leave-length-<=-2-alone rule)."""
    d1, d2, d3 = _p_drop("w", 1), _p_drop("w", 2), _p_drop("w", 3)
    step4_whens = []
    for suf in sorted(_P_STEP4, key=len, reverse=True):
        stem = _p_drop("w", len(suf))
        cond = f"{_p_m(stem)} > 1"
        if suf == "ion":
            cond += f" AND ({stem} LIKE '%s' OR {stem} LIKE '%t')"
        step4_whens.append(
            f"WHEN w LIKE '%{suf}' THEN (CASE WHEN {cond} THEN {stem} ELSE w END)"
        )
    return f"""
    p1a AS MATERIALIZED (
      SELECT tok, CASE WHEN tok LIKE '%sses' THEN substr(tok, 1, length(tok) - 2)
                       WHEN tok LIKE '%ies' THEN substr(tok, 1, length(tok) - 2)
                       WHEN tok LIKE '%ss' THEN tok
                       WHEN tok LIKE '%s' THEN substr(tok, 1, length(tok) - 1)
                       ELSE tok END AS w
      FROM {vocab}
    ),
    p1b0 AS MATERIALIZED (
      SELECT tok,
        CASE WHEN w LIKE '%eed' THEN (CASE WHEN {_p_m(d3)} > 0 THEN {d1} ELSE w END)
             WHEN w LIKE '%ed' AND {_p_hasv(d2)} THEN {d2}
             WHEN w LIKE '%ing' AND {_p_hasv(d3)} THEN {d3}
             ELSE w END AS w,
        CASE WHEN w LIKE '%eed' THEN false
             WHEN w LIKE '%ed' AND {_p_hasv(d2)} THEN true
             WHEN w LIKE '%ing' AND {_p_hasv(d3)} THEN true
             ELSE false END AS fired
      FROM p1a
    ),
    p1b AS MATERIALIZED (
      SELECT tok,
        CASE WHEN NOT fired THEN w
             WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz' THEN w || 'e'
             WHEN {_p_dd("w")} AND substr(w, length(w), 1) NOT IN ('l', 's', 'z')
               THEN {d1}
             WHEN {_p_m("w")} = 1 AND {_p_cvc("w")} THEN w || 'e'
             ELSE w END AS w
      FROM p1b0
    ),
    p1c AS MATERIALIZED (
      SELECT tok, CASE WHEN w LIKE '%y' AND {_p_hasv(d1)} THEN {d1} || 'i'
                       ELSE w END AS w
      FROM p1b
    ),
    p2 AS MATERIALIZED (
      SELECT tok, {_p_replace_case(_P_STEP2, "{stem} <> '' AND " + _p_m("{stem}") + " > 0")} AS w
      FROM p1c
    ),
    p3 AS MATERIALIZED (
      SELECT tok, {_p_replace_case(_P_STEP3, "{stem} <> '' AND " + _p_m("{stem}") + " > 0")} AS w
      FROM p2
    ),
    p4 AS MATERIALIZED (
      SELECT tok, CASE {" ".join(step4_whens)} ELSE w END AS w
      FROM p3
    ),
    p5a AS MATERIALIZED (
      SELECT tok,
        CASE WHEN w LIKE '%e' THEN (
          CASE WHEN {_p_m(d1)} > 1 OR ({_p_m(d1)} = 1 AND NOT {_p_cvc(d1)})
               THEN {d1} ELSE w END)
        ELSE w END AS w
      FROM p4
    ),
    pstem AS MATERIALIZED (
      SELECT tok,
        CASE WHEN {_p_m("w")} > 1 AND {_p_dd("w")} AND w LIKE '%l'
             THEN {_p_drop("w", 1)} ELSE w END AS stem
      FROM p5a
    )"""


def rare_rouge_sql(
    max_tokens: int = 30, n_cases: int = 100, use_stemmer: bool = False
) -> str:
    """ROUGE-L F1 oracle: the LCS DP is UNROLLED, one materialized CTE per
    answer token (r0..r{max_tokens}), each applying the engine kernel's exact
    row recurrence c_i[j] = max(c_{i-1}[j], max_{j'<=j, b[j']=a[i]}
    (c_{i-1}[j'-1]+1)) as a join-aggregate. F1 = 2*lcs/(|a|+|b|) — exact
    integer arithmetic, so the 6dp rounding is bit-identical by construction.
    ``use_stemmer=True`` routes both token streams through the independent
    SQL Porter chain (porter_stem_chain_sql; rouge_score's len>3 gate) before
    the DP — string-exact stems, so parity stays bit-level."""
    steps = []
    for i in range(1, max_tokens + 1):
        steps.append(
            f"""r{i} AS MATERIALIZED (
      SELECT r.case_id, r.j, greatest(r.c, coalesce(m.best, 0)) AS c
      FROM r{i - 1} r LEFT JOIN (
        SELECT a.case_id, bj.j, max(p.c + 1) AS best
        FROM atok a
        JOIN btok mt ON mt.case_id = a.case_id AND mt.tok = a.tok
        JOIN r{i - 1} p ON p.case_id = a.case_id AND p.j = mt.j - 1
        JOIN btok bj ON bj.case_id = a.case_id AND bj.j >= mt.j
        WHERE a.i = {i}
        GROUP BY a.case_id, bj.j
      ) m ON m.case_id = r.case_id AND m.j = r.j
    )"""
        )
    chain = ",\n    ".join(steps)
    if use_stemmer:
        # raw token streams feed the vocabulary; the DP reads the stemmed
        # streams. len(atoks)/len(rtoks) in the F1 denominator are
        # stemming-invariant (1:1), so `t` is untouched.
        stem_ctes = f"""atok0 AS MATERIALIZED (
      SELECT case_id, unnest(generate_series(1, len(atoks))) AS i, unnest(atoks) AS tok FROM t
    ),
    btok0 AS MATERIALIZED (
      SELECT case_id, unnest(generate_series(1, len(rtoks))) AS j, unnest(rtoks) AS tok FROM t
    ),
    pvocab AS MATERIALIZED (
      SELECT DISTINCT tok FROM (SELECT tok FROM atok0 UNION ALL SELECT tok FROM btok0)
      WHERE length(tok) > 3
    ),{porter_stem_chain_sql("pvocab")},
    atok AS MATERIALIZED (
      SELECT a.case_id, a.i, coalesce(s.stem, a.tok) AS tok
      FROM atok0 a LEFT JOIN pstem s ON s.tok = a.tok
    ),
    btok AS MATERIALIZED (
      SELECT b.case_id, b.j, coalesce(s.stem, b.tok) AS tok
      FROM btok0 b LEFT JOIN pstem s ON s.tok = b.tok
    )"""
    else:
        stem_ctes = """atok AS MATERIALIZED (
      SELECT case_id, unnest(generate_series(1, len(atoks))) AS i, unnest(atoks) AS tok FROM t
    ),
    btok AS MATERIALIZED (
      SELECT case_id, unnest(generate_series(1, len(rtoks))) AS j, unnest(rtoks) AS tok FROM t
    )"""
    return f"""
    WITH cases AS (
      SELECT a.doc_id AS case_id,
             substr(a.text, 1, 1000) AS answer,
             b.text AS reference
      FROM documents a JOIN documents b ON b.doc_id = (a.doc_id + 7) % 500
      WHERE a.doc_id < {n_cases}
    ),
    t AS MATERIALIZED (
      SELECT case_id,
             list_filter(string_split_regex(lower(answer), '[^a-z0-9]+'), x -> x <> '')[1:{max_tokens}] AS atoks,
             list_filter(string_split_regex(lower(reference), '[^a-z0-9]+'), x -> x <> '')[1:{max_tokens}] AS rtoks
      FROM cases
    ),
    {stem_ctes},
    r0 AS MATERIALIZED (
      SELECT case_id, 0 AS j, 0 AS c FROM t
      UNION ALL
      SELECT case_id, j, 0 AS c FROM btok
    ),
    {chain},
    lcs AS (SELECT case_id, max(c) AS lcs FROM r{max_tokens} GROUP BY case_id)
    SELECT t.case_id,
           round(CASE WHEN coalesce(l.lcs, 0) = 0 OR len(t.atoks) + len(t.rtoks) = 0
                      THEN 0.0
                      ELSE 2.0 * l.lcs / (len(t.atoks) + len(t.rtoks)) END, 6) AS rouge_l
    FROM t LEFT JOIN lcs l ON l.case_id = t.case_id
    """


def mock_judge_sql() -> str:
    return f"""
    WITH cases AS ({JUDGE_CASES}),
    t AS (SELECT case_id, lower(substr(array_to_string(docs, ' '), 1, 1000)) AS answer FROM cases)
    SELECT case_id, round({_JUDGE_SCORE}, 6) AS judge_score FROM t
    """


def sud_sql() -> str:
    return """
    WITH cases AS (
      SELECT doc_id AS case_id,
             [text, CASE WHEN doc_id % 2 = 0 THEN 'fact' ELSE '' END] AS gt_docs,
             [text, CASE WHEN doc_id % 4 = 0 THEN 'fact evidence reason citation' ELSE 'evidence' END] AS new_docs
      FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT case_id,
             lower(substr(array_to_string(gt_docs, ' '), 1, 1000)) AS ans_gt,
             lower(substr(array_to_string(new_docs, ' '), 1, 1000)) AS ans_new
      FROM cases
    )
    SELECT case_id, round(
      ((CASE WHEN contains(ans_new, 'fact') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_new, 'reason') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_new, 'evidence') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_new, 'citation') THEN 1 ELSE 0 END))::DOUBLE / 4
      -
      ((CASE WHEN contains(ans_gt, 'fact') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_gt, 'reason') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_gt, 'evidence') THEN 1 ELSE 0 END) +
       (CASE WHEN contains(ans_gt, 'citation') THEN 1 ELSE 0 END))::DOUBLE / 4, 6) AS sud
    FROM s
    """


def nms_sql() -> str:
    return """
    WITH pts AS (
      SELECT vec_id AS idx,
             ((vec_id * 37) % 101)::DOUBLE / 100 AS recall,
             ((vec_id * 73) % 89)::DOUBLE / 88 AS quality
      FROM embeddings WHERE vec_id < 100
    )
    SELECT round(sum(CASE WHEN a.recall < b.recall AND a.quality > b.quality THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS nms,
           count(*) AS pairs
    FROM pts a JOIN pts b ON a.idx < b.idx
    """


def core_sql() -> str:
    return """
    WITH cases AS (
      SELECT doc_id AS case_id,
             [text, repeat('not ', doc_id % 4)] AS docs
      FROM documents WHERE doc_id < 200
    ),
    t AS (
      SELECT case_id,
             len(list_filter(string_split(lower(array_to_string(docs, ' ')), ' '),
                 x -> x IN ('not','no','never','nor','none','nobody','nothing'))) AS negs
      FROM cases
    )
    SELECT case_id, round(1.0 / (1.0 + negs), 6) AS core FROM t
    """


def stream_hourly_sql() -> str:
    """Batch equivalent of the streaming tumbling-window aggregate (the
    stream==batch contract on finite input; no n_users — exact distinct
    counts are not streamable)."""
    return """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """


def events_hourly_sql() -> str:
    return """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """


def geo_loss_sql(
    b: int = 8,
    n_neg: int = 1,
    k_graph: int = 10,
    gamma: float = 0.2,
    temperature: float = 0.07,
    lambda_ricci: float = 0.1,
    kappa_target: float = 0.0,
    heat_time: float = 1.0,
    heat_steps: int = 5,
) -> str:
    """Relational twin of plans.trainer.geometric_loss_metrics — the full
    geometric training-loss forward (reference differentiable.py:281-403)
    re-derived step for step in SQL over the first b*(2+n_neg) embedding
    rows (query / positive / negative node layout, differentiable.py:342-347):

      L2-normalise -> squared-L2 cdist -> diag-masked row softmax at the
      epoch-0 gamma -> tau-fix rows to mass k -> hard top-k (boundary = each
      side's own k-th value) -> symmetrize -> renormalise -> W = A*D2 ->
      normalized-Laplacian heat kernel as an UNROLLED Taylor chain
      (term_s = term_{s-1} @ (-tL) / s, the engine's association) ->
      InfoNCE-geo over the (pos, negs) geodesic logits -> dense Forman
      hinge (documented formula, sum_k w_ik*w_jk/sqrt(w_ij*w_ik*w_jk+eps),
      over ALL n^2 (i,j) including eps-floored zero-edge and diagonal
      entries, exactly like the dense tensor computation).

    Unbounded metrics are emitted as round(log10(|x|), 9) — see
    geometric_loss_metrics for why absolute 9-dp rounding cannot gate a
    ~1e11 value across summation orders."""
    total = b * (2 + n_neg)
    k = min(k_graph, total - 1)
    tmul = f"(-1.0 / {temperature})"
    terms = []
    for s in range(1, heat_steps + 1):
        terms.append(
            f"""term{s} AS MATERIALIZED (
      SELECT tt.i, m.j, sum(tt.v * m.mv) / {s} AS v
      FROM term{s - 1} tt JOIN mmat m ON m.i = tt.j
      GROUP BY tt.i, m.j
    )"""
        )
    chain = ",\n    ".join(terms)
    ksum = " UNION ALL ".join(
        f"SELECT i, j, v FROM term{s}" for s in range(0, heat_steps + 1)
    )
    return f"""
    WITH nodes AS MATERIALIZED (
      SELECT vec_id AS i,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS en
      FROM ({EMB}) WHERE vec_id < {total}
    ),
    d2 AS MATERIALIZED (
      SELECT a.i, bb.i AS j,
             greatest(list_inner_product(a.en, a.en)
                      + list_inner_product(bb.en, bb.en)
                      - 2 * list_inner_product(a.en, bb.en), 0.0) AS d2
      FROM nodes a CROSS JOIN nodes bb
    ),
    lgt AS (SELECT i, j, -d2 / {gamma} AS lg FROM d2 WHERE i <> j),
    rowmax AS (SELECT i, max(lg) AS mx FROM lgt GROUP BY i),
    ex AS MATERIALIZED (
      SELECT l.i, l.j, exp(l.lg - r.mx) AS ex
      FROM lgt l JOIN rowmax r ON r.i = l.i
    ),
    pmat AS (SELECT i, j, ex / sum(ex) OVER (PARTITION BY i) AS p FROM ex),
    a1 AS MATERIALIZED (
      SELECT i, j, p * ({k} / sum(p) OVER (PARTITION BY i)) AS a FROM pmat
    ),
    kth AS (
      SELECT i, a AS kv FROM (
        SELECT i, a, row_number() OVER (PARTITION BY i ORDER BY a DESC) AS rn
        FROM a1
      ) WHERE rn = {k}
    ),
    a2 AS (
      SELECT a1.i, a1.j,
             CASE WHEN a1.a >= kk.kv THEN a1.a ELSE 0.0 END AS a
      FROM a1 JOIN kth kk ON kk.i = a1.i
    ),
    a3 AS MATERIALIZED (
      SELECT x.i, x.j, 0.5 * (x.a + y.a) AS a
      FROM a2 x JOIN a2 y ON y.i = x.j AND y.j = x.i
    ),
    rsum AS (SELECT i, sum(a) AS s FROM a3 GROUP BY i),
    wmat AS MATERIALIZED (
      SELECT a3.i, a3.j, (a3.a * ({k} / (r.s + 1e-8))) * d.d2 AS w
      FROM a3 JOIN rsum r ON r.i = a3.i
      JOIN d2 d ON d.i = a3.i AND d.j = a3.j
    ),
    asym AS MATERIALIZED (
      SELECT x.i, x.j, 0.5 * (x.w + y.w) AS w
      FROM wmat x JOIN wmat y ON y.i = x.j AND y.j = x.i
    ),
    deg AS (SELECT i, sum(w) AS deg FROM asym GROUP BY i),
    dinv AS (SELECT i, 1.0 / sqrt(deg + 1e-8) AS dv FROM deg),
    lrows AS (
      SELECT i, j, -w AS lv FROM asym
      UNION ALL
      SELECT i, i AS j, deg AS lv FROM deg
    ),
    mmat AS MATERIALIZED (
      SELECT l.i, l.j, ((di.dv * l.lv) * dj.dv) * (-{heat_time}) AS mv
      FROM lrows l
      JOIN dinv di ON di.i = l.i
      JOIN dinv dj ON dj.i = l.j
    ),
    term0 AS MATERIALIZED (SELECT i, i AS j, 1.0 AS v FROM nodes),
    {chain},
    kmat AS MATERIALIZED (SELECT i, j, sum(v) AS kv FROM ({ksum}) GROUP BY i, j),
    kk AS (SELECT i, sum(kv * kv) AS kk FROM kmat GROUP BY i),
    dpair AS MATERIALIZED (
      -- geodesic distance for the gathered (query, pos) and (query, neg)
      -- pairs only: d = ||K_i||^2 + ||K_j||^2 - 2 <K_i, K_j>
      SELECT p.r, p.role,
             ki.kk + kj.kk - 2 * coalesce(ip.ip, 0.0) AS d
      FROM (
        SELECT i AS r, i + {b} AS j, 'pos' AS role FROM nodes WHERE i < {b}
        UNION ALL
        SELECT (g - {2 * b}) // {n_neg} AS r, g AS j, 'neg' AS role
        FROM (SELECT i AS g FROM nodes WHERE i >= {2 * b})
      ) p
      JOIN kk ki ON ki.i = p.r
      JOIN kk kj ON kj.i = p.j
      LEFT JOIN (
        SELECT a.i AS i, bb.i AS j, sum(a.kv * bb.kv) AS ip
        FROM kmat a JOIN kmat bb ON bb.j = a.j
        GROUP BY a.i, bb.i
      ) ip ON ip.i = p.r AND ip.j = p.j
    ),
    logits AS MATERIALIZED (
      SELECT r, role, d * {tmul} AS lg FROM dpair
    ),
    lse AS (
      SELECT l.r,
             m.mx + ln(sum(exp(l.lg - m.mx))) AS lse,
             max(CASE WHEN l.role = 'pos' THEN l.lg END) AS first
      FROM logits l
      JOIN (SELECT r, max(lg) AS mx FROM logits GROUP BY r) m ON m.r = l.r
      GROUP BY l.r, m.mx
    ),
    info AS (SELECT avg(lse - first) AS loss_info FROM lse),
    allp AS (SELECT a.i, bb.i AS j FROM nodes a CROSS JOIN nodes bb),
    asymd AS MATERIALIZED (
      SELECT p.i, p.j, coalesce(s.w, 0.0) AS w
      FROM allp p LEFT JOIN asym s ON s.i = p.i AND s.j = p.j
    ),
    tri AS MATERIALIZED (
      SELECT x.i AS i, y.i AS j,
             sum((x.w * y.w) / sqrt(aij.w * (x.w * y.w) + 1e-9)) AS tv
      FROM asymd x
      JOIN asymd y ON y.j = x.j
      JOIN asymd aij ON aij.i = x.i AND aij.j = y.i
      GROUP BY x.i, y.i
    ),
    kappa AS MATERIALIZED (
      SELECT t.i, t.j,
             a.w * (1.0 / (di.deg + 1e-9) + 1.0 / (dj.deg + 1e-9)) - t.tv AS kv
      FROM tri t
      JOIN asymd a ON a.i = t.i AND a.j = t.j
      JOIN deg di ON di.i = t.i
      JOIN deg dj ON dj.i = t.j
    ),
    ricci AS (
      SELECT avg(CASE WHEN ({kappa_target} - kv) > 0
                      THEN ({kappa_target} - kv) * ({kappa_target} - kv)
                      ELSE 0.0 END) AS loss_ricci,
             avg(kv) AS mean_curvature
      FROM kappa
    ),
    dens AS (
      SELECT sum(CASE WHEN w > 0 THEN 1.0 ELSE 0.0 END) / {total * total} AS gd
      FROM wmat
    )
    SELECT round(i.loss_info, 9) AS loss_info,
           round(log10(r.loss_ricci), 9) AS loss_ricci_log10,
           round(log10(i.loss_info + {lambda_ricci} * r.loss_ricci), 9)
             AS loss_total_log10,
           round((SELECT avg(d) FROM dpair WHERE role = 'pos'), 9) AS mean_d_pos,
           round((SELECT avg(d) FROM dpair WHERE role = 'neg'), 9) AS mean_d_neg,
           round(log10(-r.mean_curvature), 9) AS neg_mean_curvature_log10,
           round(d.gd, 9) AS graph_density
    FROM info i, ricci r, dens d
    """
