"""Pipeline-surface queries: JSON request ingest + validation (S3),
streaming windowed ingest (ST1-ST4), multimodal binary-column plumbing
(S15/S16), sink-shaped rewrites and scalar kernels (C10/C17-C19, F11,
ST6), and the end-to-end crawl round (rows-only — it exercises disk
snapshots, which SQL can't express)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries_textdedup import h60


def _t(spark, sf_dir, name):
    # timestamp results must not depend on the caller's session TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S3: JSON crawl-request ingest + Draft4-style defaults ------------------
# (kafka-monitor.py:114-142 validate; 55-74 default injection)
def q_request_ingest(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    # synthesize the external JSON API payloads
    raw = events.select(
        F.to_json(
            F.struct(
                F.concat(F.lit("http://host-"), F.col("user_id").cast("string"),
                         F.lit(".example/p/"), F.col("event_id").cast("string")).alias("url"),
                F.col("event_type").alias("appid"),
                F.when(F.pmod("event_id", F.lit(3)) == 0, F.floor("value").cast("int")).alias("priority"),
            )
        ).alias("payload")
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("appid", T.StringType()),
            T.StructField("priority", T.IntegerType()),
        ]
    )
    parsed = raw.select(F.from_json("payload", schema).alias("req"))
    return parsed.select(
        F.col("req.url").alias("url"),
        F.col("req.appid").alias("appid"),
        F.coalesce(F.col("req.priority"), F.lit(1)).alias("priority"),  # schema default 1
    ).filter(F.col("req.url").isNotNull())  # required-field validation


SQL_REQUEST_INGEST = """
SELECT concat('http://host-', user_id, '.example/p/', event_id) AS url,
       event_type AS appid,
       CASE WHEN event_id % 3 = 0 THEN cast(floor(value) AS int) ELSE 1 END AS priority
FROM events
"""


# --- ST1-ST4: streaming windowed ingest (memory-sink smoke) ------------------
def q_streaming_window_counts(spark, sf_dir):
    events_schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(events_schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP (session
    # TZ is pinned UTC, so the cast is value-preserving)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
        )
    )
    import uuid

    name = "stream_out_" + uuid.uuid4().hex[:10]  # unique per invocation
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


SQL_STREAMING_WINDOW_COUNTS = """
SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


# --- S15/S16: multimodal binary columns + decode-stub over mapInPandas -------
# Real Spark plumbing (binary column, Arrow batches, schema); the decode
# itself is a deterministic fake (no image libs in this container —
# see file.py:170-264 / image.py:41-64 for the reference pipelines).
def q_multimodal_features(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_stub(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "format": ["fake/raw"] * len(pdf),
                }
            )

    return docs.mapInPandas(
        decode_stub,
        schema="doc_id long, n_bytes long, width int, height int, format string",
    )


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id, cast(length(text) AS bigint) AS n_bytes,
       cast(length(text) % 640 AS int) AS width,
       cast(length(text) % 480 AS int) AS height,
       'fake/raw' AS format
FROM documents
"""


# --- F11: content-type / extension validity filter (file.py:279-285) ---------
def q_content_type_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ext = F.element_at(
        F.array(F.lit("html"), F.lit("jpg"), F.lit("pdf"), F.lit("zip")),
        (F.pmod("doc_id", F.lit(4)) + 1).cast("int"),
    )
    return (
        docs.withColumn("ext", ext)
        .filter(F.col("ext").isin("html", "pdf"))
        .select("doc_id", "ext")
    )


SQL_CONTENT_TYPE_FILTER = """
SELECT doc_id, ['html','jpg','pdf','zip'][cast(doc_id % 4 AS int) + 1] AS ext
FROM documents
WHERE ['html','jpg','pdf','zip'][cast(doc_id % 4 AS int) + 1] IN ('html', 'pdf')
"""


# --- C18: deterministic UA/proxy rotation (rotate_useragent.py:44-58) --------
def q_ua_rotation(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://d/"), F.col("doc_id").cast("string"))
    uas = F.array(F.lit("ua-firefox"), F.lit("ua-chrome"), F.lit("ua-safari"))
    return docs.select(
        "doc_id",
        F.element_at(uas, (F.pmod(h60(url), F.lit(3)) + 1).cast("int")).alias("user_agent"),
    )


SQL_UA_ROTATION = """
SELECT doc_id,
       ['ua-firefox','ua-chrome','ua-safari'][
         cast(cast(concat('0x', substr(md5(concat('http://d/', doc_id)), 1, 15)) AS bigint) % 3 AS int) + 1
       ] AS user_agent
FROM documents
"""


# --- C19: google-cache URL rewrite (google_cache.py:33-52) --------------------
def q_cache_rewrite(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://host-"), (F.pmod("doc_id", F.lit(7))).cast("string"),
                   F.lit(".example/p/"), F.col("doc_id").cast("string"))
    cached = F.when(
        F.pmod("doc_id", F.lit(2)) == 0,
        F.concat(F.lit("http://cache.example/cache?q="), url),
    ).otherwise(url)
    stripped = F.regexp_replace(cached, "^http://cache\\.example/cache\\?q=", "")
    return docs.select("doc_id", cached.alias("cached_url"), stripped.alias("original_url"))


SQL_CACHE_REWRITE = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0
            THEN concat('http://cache.example/cache?q=', 'http://host-', doc_id % 7, '.example/p/', doc_id)
            ELSE concat('http://host-', doc_id % 7, '.example/p/', doc_id) END AS cached_url,
       concat('http://host-', doc_id % 7, '.example/p/', doc_id) AS original_url
FROM documents
"""


# --- C10: duration normalization H:M:S with carry (processors.py:102-151) ----
def q_duration_normalize(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    total = F.floor(F.col("value") * 10).cast("long")
    return events.select(
        "event_id",
        total.alias("total_secs"),
        F.concat_ws(
            ":",
            F.lpad((total / 3600).cast("long").cast("string"), 2, "0"),
            F.lpad(F.pmod((total / 60).cast("long"), F.lit(60)).cast("string"), 2, "0"),
            F.lpad(F.pmod(total, F.lit(60)).cast("string"), 2, "0"),
        ).alias("duration"),
    )


SQL_DURATION_NORMALIZE = """
SELECT event_id, cast(floor(value * 10) AS bigint) AS total_secs,
       concat(
         lpad(cast(cast(floor(value * 10) AS bigint) // 3600 AS varchar), 2, '0'), ':',
         lpad(cast((cast(floor(value * 10) AS bigint) // 60) % 60 AS varchar), 2, '0'), ':',
         lpad(cast(cast(floor(value * 10) AS bigint) % 60 AS varchar), 2, '0')
       ) AS duration
FROM events
"""


# --- ST6/W3: retry stream union with decayed priority (redis_retry.py:9-22) --
def q_retry_union(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    req = events.select(
        "event_id", "event_type", F.floor("value").cast("int").alias("priority")
    )
    ok = req.filter(F.col("event_type") != "error").withColumn("retry_times", F.lit(0))
    retried = (
        req.filter(F.col("event_type") == "error")
        .withColumn("priority", F.col("priority") - 10)
        .withColumn("retry_times", F.lit(1))
    )
    return ok.unionByName(retried)


SQL_RETRY_UNION = """
SELECT event_id, event_type, cast(floor(value) AS int) AS priority, 0 AS retry_times
FROM events WHERE event_type <> 'error'
UNION ALL
SELECT event_id, event_type, cast(floor(value) AS int) - 10 AS priority, 1 AS retry_times
FROM events WHERE event_type = 'error'
"""


# --- C17: headers multimap reconstruction (redis_spider.py:31-56) -------------
def q_headers_multimap(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    headers = F.create_map(
        F.lit("x-type"), F.array(F.col("event_type")),
        F.lit("x-user"), F.array(F.col("user_id").cast("string")),
    )
    exploded = events.select(
        "event_id", F.explode(headers).alias("hkey", "hvals")
    )
    return exploded.select(
        "event_id", "hkey", F.element_at("hvals", 1).alias("hval")
    )


SQL_HEADERS_MULTIMAP = """
SELECT event_id, 'x-type' AS hkey, event_type AS hval FROM events
UNION ALL
SELECT event_id, 'x-user' AS hkey, cast(user_id AS varchar) AS hval FROM events
"""


# --- the end-to-end crawl round job (rows-only: snapshot side effects) --------
def q_crawl_e2e(spark, sf_dir):
    """2-round crawl over a deterministic synthetic seed list; returns
    the crawl-ordering log. Rows-only check (disk snapshots + pandas
    UDF canonicalization are not SQL-expressible)."""
    import shutil
    import tempfile

    from . import synthetic
    from .plans import round_job as rj

    root = tempfile.mkdtemp(prefix="crawl_e2e_")
    shutil.rmtree(root, ignore_errors=True)
    seeds = synthetic.gen_seeds(spark, 200, n_hosts=20)
    robots = synthetic.gen_robots(spark, 20)
    cfg = rj.CrawlConfig(n_hosts=20, k_per_host=4, maxdepth=2)
    fmt = rj.run_crawl(spark, root, seeds, robots, cfg, rounds=2)
    return rj.crawl_order(fmt).select(
        "round_id", "url", "host", "score", "enqueue_seq", "fetch_at"
    )


# --- bloom-prefiltered dedup: same answer as the exact anti-join ---------------
def q_bloom_prefilter_dedup(spark, sf_dir):
    """The partitioned-bloom seen filter (F3/O2) — the bloom is a
    prefilter, so the result equals plain NOT IN, which IS the oracle."""
    from .operators.seen_filter import PartitionedBloom

    orders = _t(spark, sf_dir, "orders")
    cands = orders.select(
        F.col("o_orderkey").alias("url_hash"),
        F.col("o_orderkey").alias("enqueue_seq"),
        F.lit(False).alias("dont_filter"),
    )
    seen = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_orderkey").alias("url_hash")
    )
    bloom = PartitionedBloom(num_blocks=8, bits=1 << 20)
    blocks = bloom.build(seen)
    out = bloom.prefiltered_unseen(cands, seen, blocks)
    return out.select(F.col("url_hash").alias("o_orderkey"))


SQL_BLOOM_PREFILTER_DEDUP = """
SELECT o_orderkey FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 250000)
"""


REGISTRY: dict[str, tuple] = {
    "request_ingest": (q_request_ingest, SQL_REQUEST_INGEST),
    "streaming_window_counts": (q_streaming_window_counts, SQL_STREAMING_WINDOW_COUNTS),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "content_type_filter": (q_content_type_filter, SQL_CONTENT_TYPE_FILTER),
    "ua_rotation": (q_ua_rotation, SQL_UA_ROTATION),
    "cache_rewrite": (q_cache_rewrite, SQL_CACHE_REWRITE),
    "duration_normalize": (q_duration_normalize, SQL_DURATION_NORMALIZE),
    "retry_union": (q_retry_union, SQL_RETRY_UNION),
    "headers_multimap": (q_headers_multimap, SQL_HEADERS_MULTIMAP),
    "crawl_e2e": (q_crawl_e2e, None),
    "bloom_prefilter_dedup": (q_bloom_prefilter_dedup, SQL_BLOOM_PREFILTER_DEDUP),
}
