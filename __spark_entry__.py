"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship scheduling-round query on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (omitted only for
                genuinely non-SQL-expressible ops → rows-only check).

See COVERAGE.md for the operator-id → query map.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openslack_crawler_spark import (
    queries_components,
    queries_coverage,
    queries_fulltext,
    queries_ivf,
    queries_media,
    queries_pipeline,
    queries_relational,
    queries_sessions,
    queries_similarity,
    queries_textdedup,
)

_REGISTRIES = [
    queries_relational.REGISTRY,
    queries_textdedup.REGISTRY,
    queries_similarity.REGISTRY,
    queries_pipeline.REGISTRY,
    queries_media.REGISTRY,
    queries_coverage.REGISTRY,
    queries_components.REGISTRY,
    queries_sessions.REGISTRY,
    queries_ivf.REGISTRY,
    queries_fulltext.REGISTRY,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl-scheduling round — frontier build → seen
    anti-join dedup → per-host top-k dequeue → politeness slot
    assignment — over a frontier synthesized from sf0.001 events."""
    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    frontier = events.select(
        F.concat(
            F.lit("http://host-"), F.col("user_id").cast("string"),
            F.lit(".example/p/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("user_id").alias("host_id"),
        F.col("event_id").alias("enqueue_seq"),
        F.floor("value").cast("int").alias("priority"),
    ).withColumn("url_hash", F.xxhash64("url")).withColumn(
        "score", F.col("priority").cast("double")
    )
    # seen = every third URL already crawled
    seen = frontier.filter(F.pmod("enqueue_seq", F.lit(3)) == 0).select("url_hash")
    fresh = frontier.join(seen, "url_hash", "left_anti")
    w = Window.partitionBy("host_id").orderBy(F.col("score").desc(), F.col("enqueue_seq").asc())
    batch = fresh.withColumn("fetch_rank", F.row_number().over(w)).filter(
        F.col("fetch_rank") <= 8
    )
    return batch.select(
        "url", "host_id", "priority", "fetch_rank",
        (F.floor((F.col("fetch_rank") - 1) / 4) * 1.0).alias("fetch_at"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for reg in _REGISTRIES:
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _REGISTRIES:
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
