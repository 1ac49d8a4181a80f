"""Media-pipeline and scalar-kernel queries + analytics muscle
(SURVEY.md §2.1 S15, §2.8 C3-C7/C13, §2.4)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    # timestamp results must not depend on the caller's session TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S15/C3: content-addressed media keys (file.py:258-264) -------------------
def q_media_keys(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    media_url = F.concat(F.lit("http://media.example/img-"), F.col("doc_id").cast("string"))
    return docs.filter(F.pmod("doc_id", F.lit(3)) == 0).select(
        "doc_id",
        media_url.alias("media_url"),
        F.sha2(media_url, 256).alias("media_key"),
    )


SQL_MEDIA_KEYS = """
SELECT doc_id,
       concat('http://media.example/img-', doc_id) AS media_url,
       sha256(concat('http://media.example/img-', doc_id)) AS media_key
FROM documents WHERE doc_id % 3 = 0
"""


# --- media fetch plan: dedup by key + freshness gate (rows checked vs SQL) ----
def q_media_fetch_plan(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    refs = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("m-"), F.pmod("doc_id", F.lit(50)).cast("string")),
                F.concat(F.lit("m-"), F.pmod(F.col("doc_id") + 7, F.lit(50)).cast("string")),
            )
        ).alias("media_ref"),
    )
    h = F.conv(F.substring(F.md5("media_ref"), 1, 15), 16, 10).cast("long")
    already = refs.filter(F.pmod(h, F.lit(2)) == 0).select("media_ref").distinct()
    return (
        refs.join(already, "media_ref", "left_anti")
        .groupBy("media_ref")
        .agg(F.count(F.lit(1)).alias("n_wanting_docs"))
    )


SQL_MEDIA_FETCH_PLAN = """
WITH refs AS (
  SELECT doc_id, concat('m-', doc_id % 50) AS media_ref FROM documents
  UNION ALL
  SELECT doc_id, concat('m-', (doc_id + 7) % 50) AS media_ref FROM documents
)
SELECT media_ref, count(*) AS n_wanting_docs FROM refs
WHERE media_ref NOT IN (
  SELECT DISTINCT media_ref FROM refs WHERE cast(concat('0x', substr(md5(media_ref), 1, 15)) AS bigint) % 2 = 0
)
GROUP BY media_ref
"""


# --- C5-C7: string processors (processors.py:5-43) ----------------------------
def q_string_processors(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.trim(F.col("p_name")).alias("stripped"),
        F.concat(F.lit("part:"), F.col("p_name")).alias("prefixed"),
        F.concat(F.col("p_brand"), F.lit("#x")).alias("suffixed"),
        F.lit("const").alias("constant"),
        F.upper("p_type").alias("upper_type"),
    )


SQL_STRING_PROCESSORS = """
SELECT p_partkey, trim(p_name) AS stripped,
       concat('part:', p_name) AS prefixed,
       concat(p_brand, '#x') AS suffixed,
       'const' AS constant, upper(p_type) AS upper_type
FROM part
"""


# --- C13: host/path extraction from URLs (csdn.py:87,100) ---------------------
def q_host_extract(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://host-"), F.pmod("doc_id", F.lit(9)).cast("string"),
        F.lit(".example/a/"), F.col("doc_id").cast("string"), F.lit("?q=1"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )


SQL_HOST_EXTRACT = """
SELECT doc_id,
       concat('host-', doc_id % 9, '.example') AS host,
       concat('/a/', doc_id) AS path,
       'q=1' AS query
FROM documents
"""


# --- TPC-H Q1-style pricing summary (exact decimal money) ---------------------
def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("decimal(18,1)").alias("sum_qty"),
            (F.sum(dec("l_extendedprice")) * 100).cast("long").alias("sum_base_cents"),
            (F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))) * 10000)
            .cast("long")
            .alias("sum_disc_decimicro"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       cast(sum(l_quantity) AS decimal(18,1)) AS sum_qty,
       cast(sum(cast(l_extendedprice AS decimal(18,2))) * 100 AS bigint) AS sum_base_cents,
       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) * 10000 AS bigint) AS sum_disc_decimicro,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3-style: join + agg + top-k ---------------------------------------
def q_top_revenue_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
    )
    return (
        j.groupBy("l_orderkey")
        .agg(
            (F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))) * 10000)
            .cast("long")
            .alias("revenue_decimicro")
        )
        .orderBy(F.col("revenue_decimicro").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT l_orderkey,
       cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) * 10000 AS bigint) AS revenue_decimicro
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey
ORDER BY revenue_decimicro DESC, l_orderkey ASC LIMIT 10
"""


# --- A2: global max/min stats (stats.py:51-55) ---------------------------------
def q_stats_max_min(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.max("ts").alias("last_seen"),
        F.min("ts").alias("first_seen"),
    )


SQL_STATS_MAX_MIN = """
SELECT max(value) AS max_value, min(value) AS min_value,
       max(ts) AS last_seen, min(ts) AS first_seen
FROM events
"""


# --- lag/lead window: inter-event gap (sessionization primitive) ---------------
def q_event_gaps(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "user_id", "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_secs"),
    )


SQL_EVENT_GAPS = """
SELECT user_id, event_id,
       cast(floor(epoch(ts)) AS bigint) - cast(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))) AS bigint) AS gap_secs
FROM events
"""


# --- S16: thumbnail boxes as real column arithmetic (image.py:103-139,
# IMAGES_THUMBS settings.py:356-359) -------------------------------------------
def q_media_thumbnails(spark, sf_dir):
    """Aspect-fit thumbnail dims for every image doc × IMAGES_THUMBS
    size — integer-exact PIL thumbnail() semantics (operators/media.py
    with_thumb_dims); source dims are the deterministic hash of the
    media key (the codec read is the only stubbed piece)."""
    from .operators.media import IMAGES_THUMBS, with_thumb_dims
    from .queries_textdedup import h60

    docs = _t(spark, sf_dir, "documents").filter(F.pmod("doc_id", F.lit(3)) == 0)
    key = F.concat(F.lit("img-"), F.col("doc_id").cast("string"))
    imgs = docs.select(
        "doc_id",
        (F.lit(100) + F.pmod(h60(F.concat(key, F.lit("_w"))), F.lit(1900))).cast("int").alias("src_w"),
        (F.lit(100) + F.pmod(h60(F.concat(key, F.lit("_h"))), F.lit(1900))).cast("int").alias("src_h"),
    )
    sizes = F.array(
        *[
            F.struct(
                F.lit(n).alias("size_name"),
                F.lit(w).alias("box_w"),
                F.lit(h).alias("box_h"),
            )
            for n, (w, h) in IMAGES_THUMBS.items()
        ]
    )
    sized = imgs.select(
        "doc_id", "src_w", "src_h", F.explode(sizes).alias("s")
    ).select(
        "doc_id", "src_w", "src_h",
        F.col("s.size_name").alias("size_name"),
        F.col("s.box_w").alias("box_w"),
        F.col("s.box_h").alias("box_h"),
    )
    return with_thumb_dims(sized).select(
        "doc_id", "size_name", "src_w", "src_h", "out_w", "out_h"
    )


SQL_MEDIA_THUMBNAILS = """
WITH imgs AS (
  SELECT doc_id,
         cast(100 + (cast(concat('0x', substr(md5(concat('img-', doc_id, '_w')), 1, 15)) AS bigint) % 1900) AS int) AS src_w,
         cast(100 + (cast(concat('0x', substr(md5(concat('img-', doc_id, '_h')), 1, 15)) AS bigint) % 1900) AS int) AS src_h
  FROM documents WHERE doc_id % 3 = 0
), sized AS (
  SELECT doc_id, src_w, src_h, s.size_name, s.box_w, s.box_h
  FROM imgs, (VALUES ('small', 270, 270), ('big', 970, 970)) AS s(size_name, box_w, box_h)
)
SELECT doc_id, size_name, src_w, src_h,
       cast(CASE WHEN src_w <= box_w AND src_h <= box_h THEN src_w
                 WHEN (box_w * src_h) // src_w > box_h THEN greatest(1, (box_h * src_w) // src_h)
                 ELSE box_w END AS int) AS out_w,
       cast(CASE WHEN src_w <= box_w AND src_h <= box_h THEN src_h
                 WHEN (box_w * src_h) // src_w > box_h THEN box_h
                 ELSE greatest(1, (box_w * src_h) // src_w) END AS int) AS out_h
FROM sized
"""


# --- S15: dedup-by-content (GridFS checksum comparison, file.py:225-256:
# a stored file is skipped when the sha1-of-CONTENT checksum already
# exists — key-by-url alone misses same-bytes-different-url copies) ----------
def q_media_content_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://media.example/f/"), F.col("doc_id").cast("string"))
    # deterministic payload with intentional cross-URL collisions
    content = F.concat(F.lit("payload-"), F.pmod("doc_id", F.lit(40)).cast("string"))
    # sha256 stands in for the reference's sha1 (DuckDB has no sha1);
    # the content-addressed semantics are identical
    media = docs.select(
        F.sha2(url, 256).alias("media_key"),
        F.sha2(content, 256).alias("checksum"),
    )
    return media.groupBy("checksum").agg(
        F.min("media_key").alias("canonical_key"),
        F.count(F.lit(1)).alias("n_copies"),
    )


SQL_MEDIA_CONTENT_DEDUP = """
WITH media AS (
  SELECT sha256(concat('http://media.example/f/', doc_id)) AS media_key,
         sha256(concat('payload-', doc_id % 40)) AS checksum
  FROM documents
)
SELECT checksum, min(media_key) AS canonical_key, count(*) AS n_copies
FROM media GROUP BY checksum
"""


# --- audio/video frame sampling (multimodal plumbing, round 3) ---------------
def q_media_frame_sample(spark, sf_dir):
    """Uniform frame-sampling plan for audio/video media: every 4th doc
    carries an av container ref; duration/fps derive deterministically
    from the ref (the container-header read is the stubbed piece —
    operators/media.py:av_metadata); the plan emits k=4 (ts_ms,
    frame_no) sample points per container as pure narrow column work.
    The decode itself is operators/media.py:decode_frames_stub
    (mapInPandas, tested separately — binary payloads are not
    SQL-comparable)."""
    from openslack_crawler_spark.operators.media import (
        av_metadata,
        frame_sample_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    av = docs.filter(F.pmod("doc_id", F.lit(4)) == 1).select(
        "doc_id",
        F.concat(F.lit("av-"), F.col("doc_id").cast("string")).alias("media_ref"),
    )
    return frame_sample_plan(av_metadata(av), k=4).select(
        "doc_id", "media_ref", "duration_ms", "fps", "frame_idx",
        "ts_ms", "frame_no",
    )


SQL_MEDIA_FRAME_SAMPLE = """
WITH av AS (
  SELECT doc_id, concat('av-', doc_id) AS media_ref FROM documents
  WHERE doc_id % 4 = 1
), meta AS (
  SELECT doc_id, media_ref,
         1000 + (('0x' || substr(md5(media_ref || ':dur'), 1, 15))::bigint % 119001) AS duration_ms,
         ([24, 25, 30])[(('0x' || substr(md5(media_ref || ':fps'), 1, 15))::bigint % 3) + 1] AS fps
  FROM av
)
SELECT doc_id, media_ref, duration_ms, cast(fps AS int) AS fps,
       cast(i AS int) AS frame_idx,
       cast(floor(i * duration_ms / 4) AS bigint) AS ts_ms,
       cast(floor(floor(i * duration_ms / 4) * fps / 1000) AS bigint) AS frame_no
FROM meta, generate_series(0, 3) AS t(i)
"""


REGISTRY: dict[str, tuple] = {
    "media_keys": (q_media_keys, SQL_MEDIA_KEYS),
    "media_thumbnails": (q_media_thumbnails, SQL_MEDIA_THUMBNAILS),
    "media_content_dedup": (q_media_content_dedup, SQL_MEDIA_CONTENT_DEDUP),
    "media_frame_sample": (q_media_frame_sample, SQL_MEDIA_FRAME_SAMPLE),
    "media_fetch_plan": (q_media_fetch_plan, SQL_MEDIA_FETCH_PLAN),
    "string_processors": (q_string_processors, SQL_STRING_PROCESSORS),
    "host_extract": (q_host_extract, SQL_HOST_EXTRACT),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_revenue_orders": (q_top_revenue_orders, SQL_TOP_REVENUE_ORDERS),
    "stats_max_min": (q_stats_max_min, SQL_STATS_MAX_MIN),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
}
