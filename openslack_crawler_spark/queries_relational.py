"""Driver-checkable queries: crawl-operator semantics expressed over the
driver's TPC-H-ish tables (FIXTURES.md §9 mapping).

Every entry pairs a DataFrame program with an ANSI-SQL DuckDB oracle;
the driver cross-checks row count + schema + order-insensitive value
hash at sf0.01. Aggregate/computed columns are aliased identically on
both sides. Doubles that aggregate differently across engines are
rounded to 6 decimals on BOTH sides so the value hash is stable.

Operator ids (S/F/J/A/W/T/U/C...) reference SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp results must not depend on the caller's session TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- J1: seen anti-join (dupefilter.py:39-44) -------------------------------
def q_seen_antijoin(spark, sf_dir):
    """Customers with no orders — the URL-seen left_anti shape."""
    customer = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.join(orders, "c_custkey", "left_anti").select("c_custkey", "c_name")


SQL_SEEN_ANTIJOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


# --- J2/F4: broadcast blacklist anti-join (scheduler.py:76-85) --------------
def q_blacklist_antijoin(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    blacklist = (
        events.filter((F.col("event_type") == "error") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return (
        events.join(F.broadcast(blacklist), "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_BLACKLIST_ANTIJOIN = """
SELECT user_id, count(*) AS n_events FROM events
WHERE user_id NOT IN (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150
)
GROUP BY user_id
"""


# --- J3: semi-join info match (redis-monitor.py:364-387) --------------------
def q_semi_join_info(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        orders.join(cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_SEMI_JOIN_INFO = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# --- J4: lookup join + freshness filter (file.py:225-256) -------------------
def q_media_freshness(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
    return (
        j.filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_stale"))
    )


SQL_MEDIA_FRESHNESS = """
SELECT o_orderstatus, count(*) AS n_stale
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', o_orderdate, l_shipdate) > 60
GROUP BY o_orderstatus
"""


# --- J5/S8-S10: MERGE upsert emulation (es.py:24-32, mysql.py:43-59) --------
def q_merge_upsert(spark, sf_dir):
    base = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        # +1.0 is exact in binary — immune to HALF_UP/HALF_EVEN divergence
        .select("o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice"))
    )
    survivors = base.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = survivors.unionByName(updates)
    return merged.select("o_orderkey", F.col("o_totalprice").alias("price"))


SQL_MERGE_UPSERT = """
WITH updates AS (
  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
  FROM orders WHERE o_orderstatus = 'O'
)
SELECT o_orderkey, o_totalprice AS price FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
UNION ALL
SELECT o_orderkey, o_totalprice AS price FROM updates
"""


# --- S4/W1: per-group top-k dequeue (queue.py:98-109) -----------------------
def q_dequeue_topk_per_host(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


SQL_DEQUEUE_TOPK = """
SELECT event_type, rnk, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) WHERE rnk <= 3
"""


# --- T1: global priority pop (TakeOrderedAndProject) ------------------------
def q_global_pop(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .select("event_id", "value", "event_type")
    )


SQL_GLOBAL_POP = """
SELECT event_id, value, event_type FROM events
ORDER BY value DESC, event_id ASC LIMIT 10
"""


# --- A3/A4: info aggregate per crawlid (redis-monitor.py:144-195) -----------
def q_info_by_crawlid(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.max("value").alias("high_priority"),  # raw doubles: no arithmetic,
        F.min("value").alias("low_priority"),   # identical across engines
    )


SQL_INFO_BY_CRAWLID = """
SELECT event_type, count(*) AS total,
       max(value) AS high_priority,
       min(value) AS low_priority
FROM events GROUP BY event_type
"""


# --- A7: terms agg + nested stats (es_query.py:82-124) ----------------------
def q_terms_agg_stats(spark, sf_dir):
    # money as exact decimal → integer cents: double sums are partition-
    # order dependent in Spark and round() tie-modes differ across
    # engines, so aggregate exactly and emit integers
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(18,2)")
    )
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("price_dec") * 100).cast("long").alias("sum_price_cents"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .withColumn(
            "avg_price_cents",
            F.expr("sum_price_cents div n_lines").cast("long"),
        )
        .orderBy(F.col("n_lines").desc(), F.col("l_suppkey").asc())
        .limit(10)
    )


SQL_TERMS_AGG_STATS = """
SELECT l_suppkey, n_lines, sum_price_cents, min_price, max_price,
       sum_price_cents // n_lines AS avg_price_cents
FROM (
  SELECT l_suppkey, count(*) AS n_lines,
         cast(sum(cast(l_extendedprice AS decimal(18,2))) * 100 AS bigint) AS sum_price_cents,
         min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price
  FROM lineitem GROUP BY l_suppkey
)
ORDER BY n_lines DESC, l_suppkey ASC LIMIT 10
"""


# --- A5: bin-by-score (redis-monitor.py:197-216) ----------------------------
def q_bin_by_score(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn("score_bin", F.floor(F.col("value") / 10).cast("long"))
        .groupBy("score_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_BIN_BY_SCORE = """
SELECT cast(floor(value / 10) AS bigint) AS score_bin, count(*) AS n
FROM events GROUP BY 1
"""


# --- A6: distinct counts (redis-monitor.py:152-156) -------------------------
def q_distinct_hosts(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("total_crawlids"),
        F.count(F.lit(1)).alias("total_pending"),
    )


SQL_DISTINCT_HOSTS = """
SELECT count(DISTINCT user_id) AS total_crawlids, count(*) AS total_pending FROM events
"""


# --- F5: expiry filter (scheduler.py:98-103) --------------------------------
def q_expiry_filter(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_live"))
    )


SQL_EXPIRY_FILTER = """
SELECT event_type, count(*) AS n_live FROM events
WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY event_type
"""


# --- F6/W3/W4: depth guard + priority decay (link_spider.py:50-89) ----------
def q_depth_decay(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    req = events.select(
        "event_id",
        F.pmod("event_id", F.lit(5)).cast("int").alias("depth"),
        (F.floor("value").cast("int")).alias("priority"),
    )
    return (
        req.filter(F.col("depth") < 3)
        .select(
            "event_id",
            "depth",
            (F.col("priority") - 10 * F.col("depth")).alias("decayed_priority"),
        )
    )


SQL_DEPTH_DECAY = """
SELECT event_id, cast(event_id % 5 AS int) AS depth,
       cast(floor(value) AS int) - 10 * cast(event_id % 5 AS int) AS decayed_priority
FROM events WHERE cast(event_id % 5 AS int) < 3
"""


# --- W2: politeness slot assignment (crawlera.py:189-211) -------------------
def q_politeness_slots(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return events.select("user_id", "event_id", "value").withColumn(
        "fetch_rank", F.row_number().over(w)
    ).withColumn(
        "fetch_slot", F.floor((F.col("fetch_rank") - 1) / 8).cast("int")
    ).withColumn("fetch_at", (F.col("fetch_slot") * 1.5).cast("double"))


SQL_POLITENESS_SLOTS = """
SELECT user_id, event_id, value,
       row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS fetch_rank,
       cast(floor((row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) - 1) / 8) AS int) AS fetch_slot,
       cast(floor((row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) - 1) / 8) AS int) * 1.5 AS fetch_at
FROM events
"""


# --- T3: paging loop → sequence explode (stackoverflow.py:28-51) ------------
def q_pagination(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    return region.select(
        "r_name", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("page")
    )


SQL_PAGINATION = """
SELECT r_name, cast(page AS int) AS page
FROM region, generate_series(1, 3) AS t(page)
"""


# --- U1/U3: union + dedup (lxmlhtml.py:98-112) ------------------------------
def q_union_dedup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


SQL_UNION_DEDUP = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# --- U2: set difference (select_result.py:34-35) ----------------------------
def q_set_except(spark, sf_dir):
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.subtract(supp)  # EXCEPT = set difference (not exceptAll)


SQL_SET_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
"""


# --- C8/C9: date parse/format (processors.py:55-99) -------------------------
def q_date_functions(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )


SQL_DATE_FUNCTIONS = """
SELECT o_orderkey,
       cast(year(o_orderdate) AS int) AS order_year,
       cast(month(o_orderdate) AS int) AS order_month,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day
FROM orders
"""


# --- C11: regex numeric extraction (csdn.py:93-94, parsers.py:71-81) --------
def q_regex_extract(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.length("p_name").alias("name_len"),
    )


SQL_REGEX_EXTRACT = """
SELECT p_partkey,
       cast(regexp_extract(p_brand, '(\\d+)', 1) AS int) AS brand_num,
       cast(length(p_name) AS int) AS name_len
FROM part
"""


# --- C15/C16: JSON field extraction (loader.py:6-12, stackoverflow.py) ------
def q_json_extract(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


SQL_JSON_EXTRACT = """
SELECT event_type,
       cast(sum(cast(json_extract_string(props, '$.k') AS int)) AS bigint) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# --- F8/C1: URL fixup + canonicalize (scheduler.py:150-156,
#            select_result.py:60-73) — via the real pandas-UDF kernel -------
def q_url_canonicalize(spark, sf_dir):
    from .functions.url import canonicalize_udf

    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://"),
            F.upper("source"),
            F.lit(".Example.COM:80/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?b=2&a=1#frag"),
        ).alias("raw_url"),
    )
    return raw.select("doc_id", canonicalize_udf(F.col("raw_url")).alias("url"))


SQL_URL_CANONICALIZE = """
SELECT doc_id,
       concat('http://', lower(source), '.example.com/doc/', doc_id, '?a=1&b=2') AS url
FROM documents
"""


# --- C20/A8: first-occurrence dedup collapse (lxmlhtml.py:67-68) ------------
def q_dedup_collapse(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("first_doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("first_doc_id", "n_copies")


SQL_DEDUP_COLLAPSE = """
SELECT min(doc_id) AS first_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


REGISTRY: dict[str, tuple] = {
    "seen_antijoin": (q_seen_antijoin, SQL_SEEN_ANTIJOIN),
    "blacklist_antijoin": (q_blacklist_antijoin, SQL_BLACKLIST_ANTIJOIN),
    "semi_join_info": (q_semi_join_info, SQL_SEMI_JOIN_INFO),
    "media_freshness": (q_media_freshness, SQL_MEDIA_FRESHNESS),
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "dequeue_topk_per_host": (q_dequeue_topk_per_host, SQL_DEQUEUE_TOPK),
    "global_pop": (q_global_pop, SQL_GLOBAL_POP),
    "info_by_crawlid": (q_info_by_crawlid, SQL_INFO_BY_CRAWLID),
    "terms_agg_stats": (q_terms_agg_stats, SQL_TERMS_AGG_STATS),
    "bin_by_score": (q_bin_by_score, SQL_BIN_BY_SCORE),
    "distinct_hosts": (q_distinct_hosts, SQL_DISTINCT_HOSTS),
    "expiry_filter": (q_expiry_filter, SQL_EXPIRY_FILTER),
    "depth_decay": (q_depth_decay, SQL_DEPTH_DECAY),
    "politeness_slots": (q_politeness_slots, SQL_POLITENESS_SLOTS),
    "pagination": (q_pagination, SQL_PAGINATION),
    "union_dedup": (q_union_dedup, SQL_UNION_DEDUP),
    "set_except": (q_set_except, SQL_SET_EXCEPT),
    "date_functions": (q_date_functions, SQL_DATE_FUNCTIONS),
    "regex_extract": (q_regex_extract, SQL_REGEX_EXTRACT),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "url_canonicalize": (q_url_canonicalize, SQL_URL_CANONICALIZE),
    "dedup_collapse": (q_dedup_collapse, SQL_DEDUP_COLLAPSE),
}
