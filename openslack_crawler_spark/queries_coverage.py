"""Tail-coverage queries for the remaining SURVEY.md §2 operators:
S6/S7 (FIFO/LIFO queue pops), S11/S14 (JSON item sink shape), F9/A8
(null-strip + dedup-collapse projections), C8 (natural-language date
parse), C14 (Content-Disposition filename extraction), P4 (CrawlSpider
rule routing)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _t(spark, sf_dir, name):
    # timestamp results must not depend on the caller's session TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S6: FIFO queue pop (queue.py:62-82 lpush/rpop) ---------------------------
def q_fifo_pop(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.orderBy(F.col("event_id").asc())
        .limit(20)
        .select("event_id", "event_type")
    )


SQL_FIFO_POP = """
SELECT event_id, event_type FROM events ORDER BY event_id ASC LIMIT 20
"""


# --- S7: LIFO stack pop (queue.py:112-133 lpush/lpop) -------------------------
def q_lifo_pop(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    return (
        events.orderBy(F.col("event_id").desc())
        .limit(20)
        .select("event_id", "event_type")
    )


SQL_LIFO_POP = """
SELECT event_id, event_type FROM events ORDER BY event_id DESC LIMIT 20
"""


# --- S11/S14: JSON item export shape (kafkap.py:29-41, jsonp.py:6-16) ---------
# JSON built with explicit concat on BOTH sides: engines' native
# to_json/whitespace conventions differ, the sink contract doesn't.
def q_json_export(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(
            F.lit('{"doc_id":'), F.col("doc_id").cast("string"),
            F.lit(',"lang":"'), F.col("lang"),
            F.lit('","n_chars":'), F.col("n_chars").cast("string"), F.lit("}"),
        ).alias("value")
    )


SQL_JSON_EXPORT = """
SELECT concat('{"doc_id":', doc_id, ',"lang":"', lang, '","n_chars":', n_chars, '}') AS value
FROM documents
"""


# --- F9/A8: null-strip + dedup-collapse projections (select_result.py) --------
def q_null_strip_collapse(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    arr = F.array(
        F.when(F.col("event_type") != "error", F.col("event_type")),  # null when error
        F.lit(None).cast("string"),
        F.col("event_type"),
        F.col("event_type"),  # duplicate
    )
    return events.select(
        "event_id",
        F.array_compact(arr).alias("stripped"),
        F.array_distinct(F.array_compact(arr)).alias("collapsed"),
    ).select(
        "event_id",
        F.size("stripped").alias("n_stripped"),
        F.size("collapsed").alias("n_collapsed"),
        F.element_at("collapsed", 1).alias("first_value"),
    )


SQL_NULL_STRIP_COLLAPSE = """
WITH arrs AS (
  SELECT event_id,
         list_filter([
           CASE WHEN event_type <> 'error' THEN event_type END,
           NULL, event_type, event_type
         ], x -> x IS NOT NULL) AS stripped
  FROM events
)
SELECT event_id,
       cast(len(stripped) AS int) AS n_stripped,
       cast(len(list_distinct(stripped)) AS int) AS n_collapsed,
       list_distinct(stripped)[1] AS first_value
FROM arrs
"""


# --- C8: date parse with formats + natural language (processors.py:55-70) -----
def q_date_parse_natural(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    raw = F.when(F.pmod("event_id", F.lit(3)) == 0, F.lit("today")).when(
        F.pmod("event_id", F.lit(3)) == 1, F.lit("yesterday")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd"))
    today = F.lit("2026-08-16").cast("date")  # fixed 'now' for determinism
    return events.select(
        "event_id",
        raw.alias("raw_date"),
        F.when(raw == "today", today)
        .when(raw == "yesterday", F.date_sub(today, 1))
        .otherwise(F.to_date(raw, "yyyy-MM-dd"))
        .alias("parsed"),
    )


SQL_DATE_PARSE_NATURAL = """
SELECT event_id,
       CASE WHEN event_id % 3 = 0 THEN 'today'
            WHEN event_id % 3 = 1 THEN 'yesterday'
            ELSE strftime(ts, '%Y-%m-%d') END AS raw_date,
       CASE WHEN event_id % 3 = 0 THEN DATE '2026-08-16'
            WHEN event_id % 3 = 1 THEN DATE '2026-08-15'
            ELSE cast(strftime(ts, '%Y-%m-%d') AS date) END AS parsed
FROM events
"""


# --- C14: Content-Disposition filename extraction (file.py:287-325) -----------
FILENAME_RE = r'filename="?([^";]+)"?'


@F.pandas_udf(T.StringType())
def decode_filename_udf(headers: pd.Series) -> pd.Series:
    """Vectorized filename extraction + charset-tolerant decode (the
    reference tries gbk then utf-8, file.py:287-325; ASCII inputs here,
    the decode seam is where the codec fallback lives)."""
    import re

    rx = re.compile(FILENAME_RE)

    def pick(h):
        if not h:
            return None
        m = rx.search(h)
        return m.group(1) if m else None

    return headers.map(pick)


def q_content_disposition(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    header = F.concat(
        F.lit('attachment; filename="doc-'),
        F.col("doc_id").cast("string"),
        F.lit('.'), F.col("lang"), F.lit('.txt"'),
    )
    return docs.select(
        "doc_id", decode_filename_udf(header).alias("filename")
    )


SQL_CONTENT_DISPOSITION = """
SELECT doc_id, concat('doc-', doc_id, '.', lang, '.txt') AS filename
FROM documents
"""


# --- P4: CrawlSpider Rule routing (cnblogs.py:20-24) ---------------------------
def q_rule_routing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://site.example/"),
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("article/"))
        .when(F.pmod("doc_id", F.lit(4)) == 1, F.lit("list/page/"))
        .when(F.pmod("doc_id", F.lit(4)) == 2, F.lit("user/"))
        .otherwise(F.lit("static/img/")),
        F.col("doc_id").cast("string"),
    )
    callback = (
        F.when(url.rlike("/article/"), F.lit("parse_item"))
        .when(url.rlike("/list/page/"), F.lit("follow_only"))
        .when(url.rlike("/user/"), F.lit("parse_user"))
        .otherwise(F.lit("drop"))
    )
    return docs.select(
        "doc_id", url.alias("url"), callback.alias("callback"),
        (callback != "drop").alias("follow"),
    )


SQL_RULE_ROUTING = """
WITH u AS (
  SELECT doc_id,
         concat('http://site.example/',
                CASE WHEN doc_id % 4 = 0 THEN 'article/'
                     WHEN doc_id % 4 = 1 THEN 'list/page/'
                     WHEN doc_id % 4 = 2 THEN 'user/'
                     ELSE 'static/img/' END,
                doc_id) AS url
  FROM documents
)
SELECT doc_id, url,
       CASE WHEN regexp_matches(url, '/article/') THEN 'parse_item'
            WHEN regexp_matches(url, '/list/page/') THEN 'follow_only'
            WHEN regexp_matches(url, '/user/') THEN 'parse_user'
            ELSE 'drop' END AS callback,
       CASE WHEN regexp_matches(url, '/article/') THEN 'parse_item'
            WHEN regexp_matches(url, '/list/page/') THEN 'follow_only'
            WHEN regexp_matches(url, '/user/') THEN 'parse_user'
            ELSE 'drop' END <> 'drop' AS follow
FROM u
"""


REGISTRY: dict[str, tuple] = {
    "fifo_pop": (q_fifo_pop, SQL_FIFO_POP),
    "lifo_pop": (q_lifo_pop, SQL_LIFO_POP),
    "json_export": (q_json_export, SQL_JSON_EXPORT),
    "null_strip_collapse": (q_null_strip_collapse, SQL_NULL_STRIP_COLLAPSE),
    "date_parse_natural": (q_date_parse_natural, SQL_DATE_PARSE_NATURAL),
    "content_disposition": (q_content_disposition, SQL_CONTENT_DISPOSITION),
    "rule_routing": (q_rule_routing, SQL_RULE_ROUTING),
}
