"""IVF-Flat approximate nearest neighbor: partition the vector space
into cells around sampled centroids, search only the query's nprobe
nearest cells — the coarse-quantization scale path (vs the LSH variant
in queries_similarity.py). At 10^10 vectors the cell assignment is a
broadcast join against K centroids and the search shuffles only the
probed cells.

Determinism: centroids are the first K vectors (sampled, no Lloyd
iterations — k-means' double accumulations are summation-order
dependent); similarities are in-order folds (bitwise equal to DuckDB's
list_dot_product); ties break on ids.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries_similarity import cosine_expr

K_CELLS = 16
N_PROBE = 2
N_QUERIES = 10
TOP_K = 5


def _t(spark, sf_dir, name):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    # cell assignment: nearest centroid by cosine (broadcast K rows)
    scored = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "c_sim", cosine_expr(F.col("embedding"), F.col("c_emb"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("cell").asc()
    )
    assigned = (
        scored.withColumn("crnk", F.row_number().over(w_assign))
        .filter(F.col("crnk") == 1)
        .select("vec_id", "embedding", "cell")
    )
    # queries probe their N_PROBE nearest cells
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("crnk", F.row_number().over(w_assign))
        .filter(F.col("crnk") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "cell")
    )
    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"), "cell"
    )
    searched = (
        probes.join(cands, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_expr(F.col("q_emb"), F.col("n_emb")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        searched.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id", "rnk", "neighbor_id",
            F.floor(F.col("sim") * 1000000).cast("long").alias("sim_micro"),
        )
    )


_COSINE = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)

SQL_ANN_IVF_TOPK = f"""
WITH centroids AS (
  SELECT vec_id AS cell, embedding AS c_emb FROM embeddings WHERE vec_id < {K_CELLS}
), scored AS (
  SELECT e.vec_id, e.embedding, c.cell,
         {_COSINE.format(a='e.embedding', b='c.c_emb')} AS c_sim
  FROM embeddings e, centroids c
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cell ASC) AS crnk
    FROM scored
  ) WHERE crnk = 1
), probes AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
    SELECT vec_id, embedding, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cell ASC) AS crnk
    FROM scored WHERE vec_id < {N_QUERIES}
  ) WHERE crnk <= {N_PROBE}
), searched AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         {_COSINE.format(a='p.q_emb', b='a.embedding')} AS sim
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE p.query_id <> a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM searched
)
SELECT query_id, cast(rnk AS int) AS rnk, neighbor_id,
       cast(floor(sim * 1000000) AS bigint) AS sim_micro
FROM ranked WHERE rnk <= {TOP_K}
"""


REGISTRY: dict[str, tuple] = {
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
}
