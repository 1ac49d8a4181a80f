"""Frontier priority-queue semantics: enqueue filters, scoring, per-host
top-k dequeue, salted skew handling.

Reference semantics:
- enqueue pipeline order: dupe → blacklist → expiry → push
  (/root/reference/crawler/schedulers/kafka/scheduler.py:87-103).
- zset push score = -priority, pop = highest priority first
  (/root/reference/crawler/schedulers/redis/queue.py:92-109). Redis
  breaks score ties lexicographically by pickled blob (arbitrary);
  the rebuild's documented tiebreak is (score desc, enqueue_seq asc)
  — the parity oracle follows the same rule (SURVEY.md §7 step 4).
- priority decay: -10 per retry (/root/reference/crawler/middlewares/
  redis_retry.py:20), -10 per depth (/root/reference/examples/
  link_spider.py:81).
- depth guard (link_spider.py:50-56), expiry (scheduler.py:98-103),
  blacklist (scheduler.py:76-85).

Scale design (SURVEY.md §4 O4): the dequeue shuffles on host_hash; a
Zipf host distribution makes that skewed, so rows carry a `salt`
bucket — pmod(url_hash, s) — and heavy window work runs on
(host_hash, salt) first, then a cheap merge of the s per-salt top-k
lists picks the global per-host top-k. AQE skew-join stays on as the
safety net.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEPTH_DECAY = 10  # link_spider.py:81
RETRY_DECAY = 10  # redis_retry.py:20
DEFAULT_SALT_BUCKETS = 16

def dequeue_order():
    """(score desc, enqueue_seq asc) — the documented pop tiebreak."""
    return [F.col("score").desc(), F.col("enqueue_seq").asc()]


def score_expr():
    """Frontier ordering key. Redis stores -priority and pops ascending
    (queue.py:92-109) == descending priority; we keep score==priority
    and sort desc."""
    return F.col("priority").cast("double")


def decay_for_retry(df: DataFrame) -> DataFrame:
    """Retry re-enqueue: priority-10, retry_times+1, dont_filter=True
    (redis_retry.py:9-22)."""
    return (
        df.withColumn("priority", F.col("priority") - RETRY_DECAY)
        .withColumn("retry_times", F.col("retry_times") + 1)
        .withColumn("dont_filter", F.lit(True))
        .withColumn("score", score_expr())
    )


def child_priority(parent_priority):
    """Child request priority = parent - 10 (link_spider.py:81)."""
    return parent_priority - DEPTH_DECAY


def apply_enqueue_filters(
    cands: DataFrame,
    blacklist: DataFrame | None = None,
    now_expr=None,
) -> DataFrame:
    """Blacklist + expiry + depth filters, in the reference's order
    (scheduler.py:87-103). Catalyst reorders the cheap predicates
    anyway (SURVEY.md §4 O1); the blacklist is tiny → broadcast anti."""
    out = cands.filter(F.col("depth") <= F.col("maxdepth"))
    now_expr = now_expr if now_expr is not None else F.current_timestamp()
    out = out.filter(F.col("expires").isNull() | (now_expr < F.col("expires")))
    if blacklist is not None:
        out = out.join(
            F.broadcast(blacklist.select("appid", "crawlid")),
            ["appid", "crawlid"],
            "left_anti",
        )
    return out


def mark_enqueue_filters(
    cands: DataFrame,
    blacklist: DataFrame | None = None,
    now_expr=None,
    flag_col: str = "_enqueue_ok",
) -> DataFrame:
    """Same predicates as apply_enqueue_filters but marking instead of
    filtering: adds `flag_col` boolean. Lets the caller keep dropped
    fingerprints (they still enter the seen set, with NULL added_seq)
    while accepted rows carry their assigned enqueue_seq."""
    now_expr = now_expr if now_expr is not None else F.current_timestamp()
    ok = (F.col("depth") <= F.col("maxdepth")) & (
        F.col("expires").isNull() | (now_expr < F.col("expires"))
    )
    # NULL depth/maxdepth must yield False, not NULL — a NULL flag would
    # escape BOTH filter(ok) and filter(~ok) downstream, so the row's
    # fingerprint would enter neither accepted_seen nor dropped_seen and
    # the URL could be re-crawled later.
    ok = F.coalesce(ok, F.lit(False))
    if blacklist is not None:
        bl = F.broadcast(
            blacklist.select("appid", "crawlid").distinct()
            .withColumn("_blacklisted", F.lit(True))
        )
        cands = cands.join(bl, ["appid", "crawlid"], "left")
        ok = ok & F.col("_blacklisted").isNull()
        return cands.withColumn(flag_col, ok).drop("_blacklisted")
    return cands.withColumn(flag_col, ok)


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Hot-host salt bucket: deterministic pmod(url_hash, buckets)."""
    return df.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(buckets)).cast("int"))


def dequeue_top_k_per_host(
    frontier: DataFrame, k: int, salted: bool = True
) -> DataFrame:
    """Per-host top-k pop (S4/W1): the set-oriented equivalent of N
    zrange(0,0) pops with a per-host batch budget.

    salted=True runs the rank in two phases: per-(host,salt) local
    top-k (parallel even for a hot host), then per-host merge of the
    ≤ salt_buckets×k survivors — same result, bounded skew.
    """
    if salted and "salt" in frontier.columns:
        w_local = Window.partitionBy("host_hash", "salt").orderBy(*dequeue_order())
        local = (
            frontier.withColumn("_lrn", F.row_number().over(w_local))
            .filter(F.col("_lrn") <= k)
            .drop("_lrn")
        )
        src = local
    else:
        src = frontier
    w = Window.partitionBy("host_hash").orderBy(*dequeue_order())
    return (
        src.withColumn("dequeue_rank", F.row_number().over(w))
        .filter(F.col("dequeue_rank") <= k)
    )


def pop_global_top1(frontier: DataFrame) -> DataFrame:
    """Global priority pop (queue.py:98-109) — TakeOrderedAndProject,
    no full sort."""
    return frontier.orderBy(*dequeue_order()).limit(1)


def remove_dequeued(frontier: DataFrame, batch: DataFrame) -> DataFrame:
    """Frontier minus the dequeued batch (the zremrangebyrank half of
    the atomic pop, queue.py:98-109) — anti-join on url_hash."""
    return frontier.join(batch.select("url_hash"), "url_hash", "left_anti")
