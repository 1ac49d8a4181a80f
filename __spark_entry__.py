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
    queries_pretrain,
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
    queries_pretrain.REGISTRY,
]

# The driver's correctness gate checks the FIRST 50 queries in iteration
# order. This explicit window puts every §2-critical crawl operator and
# every LLM-pipeline flagship inside it; the remainder (small
# single-operator variants whose shapes the window already covers) stay
# registered and oracle-checked locally via tools/check_oracle.py.
_WINDOW = [
    # crawl core: joins, frontier, scheduling
    "seen_antijoin", "blacklist_antijoin", "dequeue_topk_per_host",
    "global_pop", "merge_upsert", "semi_join_info", "media_freshness",
    "info_by_crawlid", "depth_decay", "politeness_slots",
    "url_canonicalize", "json_extract",
    # ingest/pipeline + the end-to-end crawl
    "request_ingest", "streaming_window_counts", "multimodal_features",
    "content_type_filter", "retry_union", "crawl_e2e", "crawl_e2e_summary",
    "bloom_prefilter_dedup",
    # text dedup + corpus pipelines
    "dedup_exact", "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "ngram_jaccard_pairs", "lang_id", "quality_score", "token_count",
    "doc_fingerprint", "quality_gopher", "corpus_clean_pipeline",
    "corpus_clean_fuzzy",
    # pretraining-corpus assembly (round 3; displaced dedup_collapse /
    # terms_agg_stats / union_dedup / media_keys — all r02-verified
    # green, shapes still covered in-window by dedup_exact /
    # info_by_crawlid / retry_union / media_content_dedup)
    "corpus_sample_stratified", "mix_weights_temperature",
    "corpus_shard_pack", "decontaminate_overlap", "pii_scan",
    # similarity / ANN ("lsh_buckets" — already driver-verified green in
    # r02 and shape-subsumed by ann_lsh_topk — yields its slot to the
    # never-verified BM25 ranker)
    "ann_cosine_topk", "ann_lsh_topk",
    "ann_lsh_multiband_topk", "embedding_neardup_pairs",
    "dedup_components", "ann_ivf_topk",
    # full-text + sessions + media
    "text_match_topk", "text_bm25_topk", "docs_with_children",
    "sessionize", "seen_ttl_expiry",
    "media_thumbnails", "media_content_dedup",
]


def _ordered_items():
    merged: dict[str, tuple] = {}
    for reg in _REGISTRIES:
        merged.update(reg)
    for name in _WINDOW:
        if name in merged:
            yield name, merged.pop(name)
    yield from merged.items()


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
    return {name: fn for name, (fn, _sql) in _ordered_items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _ordered_items() if sql is not None
    }
