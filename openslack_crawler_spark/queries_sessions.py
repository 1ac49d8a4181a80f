"""Sessionization + TTL'd seen-set queries.

- sessionize: gap-based sessions via lag + conditional cumsum — the
  batch twin of streaming session_window (SURVEY.md guide pattern);
  crawl use: group a host's fetch log into politeness "bursts".
- seen_ttl_expiry: the reference's dupefilter fingerprints expire
  after 7 days (/root/reference/crawler/schedulers/redis/
  dupefilter.py:12 timeout=7*24*3600) — as a set-oriented filter, the
  seen table is pruned by added_at age and the expired URLs become
  crawlable again.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SESSION_GAP_SECS = 1800  # 30 min


def _t(spark, sf_dir, name):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_sessionize(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_break = events.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECS), 1).otherwise(0),
    )
    sess = with_break.withColumn(
        "session_id",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


SQL_SESSIONIZE = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR cast(floor(epoch(ts)) AS bigint) - cast(floor(epoch(lag(ts) OVER w)) AS bigint) > {SESSION_GAP_SECS}
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT user_id, ts,
         sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, cast(session_id AS bigint) AS session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess GROUP BY user_id, session_id
"""


def q_seen_ttl_expiry(spark, sf_dir):
    """Dupefilter TTL: fingerprints older than 7 days (vs a fixed 'now')
    expire; URLs whose fingerprint expired become crawlable again."""
    events = _t(spark, sf_dir, "events")
    seen = events.select(
        F.col("event_id").alias("url_hash"), F.col("ts").alias("added_at")
    )
    now = F.lit("2024-01-08 00:00:00").cast("timestamp")
    live = seen.filter(
        F.col("added_at") > now - F.expr("INTERVAL 7 DAYS")
    )
    cands = events.select(F.col("event_id").alias("url_hash"))
    return (
        cands.join(live.select("url_hash"), "url_hash", "left_anti")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_recrawlable"))
    )


SQL_SEEN_TTL_EXPIRY = """
SELECT count(*) AS n_recrawlable FROM events
WHERE event_id NOT IN (
  SELECT event_id FROM events
  WHERE ts > TIMESTAMP '2024-01-08 00:00:00' - INTERVAL 7 DAY
)
"""


REGISTRY: dict[str, tuple] = {
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "seen_ttl_expiry": (q_seen_ttl_expiry, SQL_SEEN_TTL_EXPIRY),
}
