"""Per-host politeness: robots filtering + token-bucket fetch-slot
assignment.

Reference semantics:
- per-domain download slot with delay (/root/reference/crawler/
  middlewares/crawlera.py:189-211; DOWNLOAD_DELAY /root/reference/
  crawler/settings2.py:14), per-domain concurrency cap 8
  (settings2.py:18), robots.txt obeyed (/root/reference/crawler/
  settings.py:138 ROBOTSTXT_OBEY).

Spark rebuild (SURVEY.md §2.5 W2): wall-clock pacing becomes a virtual
clock — within a scheduling round, the i-th fetch against a host (rank
by the dequeue order) runs in slot floor(i / max_parallel) and is
stamped fetch_at = round_start + slot * crawl_delay. The parity oracle
uses the same virtual clock, making "same fetch multiset per politeness
budget window" checkable.

Robots rules for the whole host space are a small table → broadcast
join; the disallow-prefix test is a JVM-side `exists()` lambda over the
prefix array (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url import path_of
from .frontier import dequeue_order

DEFAULT_CRAWL_DELAY = 1.0  # settings2.py:14
DEFAULT_MAX_PARALLEL = 8  # settings2.py:18


def robots_filter(batch: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop URLs whose path starts with a disallowed prefix for their
    host. robots is broadcast (one row per host — tiny next to the
    frontier)."""
    r = robots.select(
        F.col("host").alias("_r_host"), F.col("disallow").alias("_r_disallow")
    )
    joined = batch.join(
        F.broadcast(r), batch["host"] == r["_r_host"], "left"
    )
    path = path_of(F.col("url"))
    allowed = F.col("_r_disallow").isNull() | ~F.exists(
        F.col("_r_disallow"), lambda p: path.startswith(p)
    )
    return joined.filter(allowed).drop("_r_host", "_r_disallow")


def assign_fetch_slots(
    batch: DataFrame,
    robots: DataFrame | None = None,
    round_start=None,
) -> DataFrame:
    """Token-bucket politeness window: per-host rank → slot → fetch_at.

    fetch_rank : 1-based per-host rank in dequeue order
    slot       : floor((rank-1) / max_parallel)
    fetch_at   : round_start + slot * crawl_delay   (virtual seconds)
    """
    if robots is not None:
        r = robots.select(
            F.col("host").alias("_r_host"),
            F.col("crawl_delay").alias("_crawl_delay"),
            F.col("max_parallel").alias("_max_parallel"),
        )
        out = batch.join(F.broadcast(r), batch["host"] == r["_r_host"], "left").drop(
            "_r_host"
        )
    else:
        out = batch.withColumn("_crawl_delay", F.lit(None).cast("double")).withColumn(
            "_max_parallel", F.lit(None).cast("int")
        )
    delay = F.coalesce(F.col("_crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY))
    cap = F.coalesce(F.col("_max_parallel"), F.lit(DEFAULT_MAX_PARALLEL))
    w = Window.partitionBy("host_hash").orderBy(*dequeue_order())
    out = out.withColumn("fetch_rank", F.row_number().over(w))
    slot = F.floor((F.col("fetch_rank") - 1) / cap)
    base = F.lit(0.0) if round_start is None else round_start
    return (
        out.withColumn("fetch_slot", slot.cast("int"))
        .withColumn("fetch_at", (base + slot * delay).cast("double"))
        .drop("_crawl_delay", "_max_parallel")
    )
