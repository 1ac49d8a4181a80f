"""ANN recall report — the honest currency for "would the approximate
paths survive 100 TB". Overlap@k of the LSH-bucketed and IVF-Flat
top-k against the exact distributed kernel, per query, aggregated to
one row per method.

Every number is exact-integer for cross-engine determinism:
  per-query recall_micro = (hits * 1_000_000) DIV k_exact
  mean_recall_micro      = sum(recall_micro) DIV n_queries
(Spark `DIV` == DuckDB `//` on BIGINT; no float division anywhere.)

The report is SQL-expressible by construction: its oracle composes the
three ANN oracles (ann_cosine_topk / ann_lsh_topk / ann_ivf_topk) as
CTEs, so the driver's hash check covers the whole comparison, not just
the aggregation.

Scale shape: the three underlying queries are the scale-audited plans
(parallel scan kernel, bucket equi-join, cell equi-join); the report
itself joins two O(Q·k) result sets — driver-scale by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .queries_ivf import SQL_ANN_IVF_TOPK, q_ann_ivf_topk
from .queries_similarity import (
    SQL_ANN_COSINE_TOPK,
    SQL_ANN_LSH_MULTIBAND_TOPK,
    SQL_ANN_LSH_TOPK,
    q_ann_cosine_topk,
    q_ann_lsh_multiband_topk,
    q_ann_lsh_topk,
)


def recall_vs_exact(approx: DataFrame, exact: DataFrame, method: str) -> DataFrame:
    """One aggregate row: (method, n_queries, mean_recall_micro,
    min_recall_micro) of `approx` against `exact`, both shaped
    (query_id, rnk, neighbor_id, ...)."""
    exact_k = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = exact_k.join(hits, "query_id", "left").select(
        "query_id",
        F.expr("coalesce(hits, 0) * 1000000 DIV k").alias("recall_micro"),
    )
    return per_q.agg(
        F.lit(method).alias("method"),
        F.count(F.lit(1)).alias("n_queries"),
        F.expr("sum(recall_micro) DIV count(*)").alias("mean_recall_micro"),
        F.min("recall_micro").alias("min_recall_micro"),
    )


def q_ann_recall_report(spark, sf_dir):
    exact = q_ann_cosine_topk(spark, sf_dir)
    lsh = q_ann_lsh_topk(spark, sf_dir)
    mband = q_ann_lsh_multiband_topk(spark, sf_dir)
    ivf = q_ann_ivf_topk(spark, sf_dir)
    return (
        recall_vs_exact(lsh, exact, "lsh")
        .unionByName(recall_vs_exact(mband, exact, "lsh_multiband"))
        .unionByName(recall_vs_exact(ivf, exact, "ivf"))
    )


def _per_method_sql(method: str, approx_cte: str) -> str:
    return f"""
SELECT '{method}' AS method,
       cast(count(*) AS bigint) AS n_queries,
       cast(cast(sum(recall_micro) AS bigint) // count(*) AS bigint) AS mean_recall_micro,
       cast(min(recall_micro) AS bigint) AS min_recall_micro
FROM (
  SELECT k.query_id,
         (cast(coalesce(h.hits, 0) AS bigint) * 1000000) // k.k AS recall_micro
  FROM (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id) k
  LEFT JOIN (
    SELECT e.query_id, count(*) AS hits
    FROM exact e
    JOIN {approx_cte} a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
  ) h ON k.query_id = h.query_id
)
"""


SQL_ANN_RECALL_REPORT = f"""
WITH exact AS ({SQL_ANN_COSINE_TOPK}),
     lshr AS ({SQL_ANN_LSH_TOPK}),
     mbandr AS ({SQL_ANN_LSH_MULTIBAND_TOPK}),
     ivfr AS ({SQL_ANN_IVF_TOPK})
{_per_method_sql("lsh", "lshr")}
UNION ALL
{_per_method_sql("lsh_multiband", "mbandr")}
UNION ALL
{_per_method_sql("ivf", "ivfr")}
"""


REGISTRY: dict[str, tuple] = {
    "ann_recall_report": (q_ann_recall_report, SQL_ANN_RECALL_REPORT),
}
