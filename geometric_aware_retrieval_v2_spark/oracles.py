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

TOKS = "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents WHERE text IS NOT NULL"
TF = f"SELECT doc_id, term, count(*) AS tf FROM ({TOKS}) GROUP BY doc_id, term"
DL = f"SELECT doc_id, count(*) AS doc_len FROM ({TOKS}) GROUP BY doc_id"


def tokenize_tf_sql() -> str:
    return TF


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
    qterms AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS term FROM q),
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


def events_hourly_sql() -> str:
    return """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """
