"""Reference enqueue-order subtlety (scheduler.py:87-103): the
dupefilter is check-AND-insert and runs BEFORE the blacklist check, so
a blacklisted candidate still enters the seen set — it can never be
crawled later even if the blacklist is lifted."""

from pyspark.sql import functions as F

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.plans import round_job as rj


def test_blacklisted_candidates_still_fingerprinted(spark, tmp_path):
    seeds = synthetic.gen_seeds(spark, 150, n_hosts=10)
    robots = synthetic.gen_robots(spark, 10)
    cfg = rj.CrawlConfig(n_hosts=10, k_per_host=4, maxdepth=2)
    root = str(tmp_path / "bl")
    fmt = rj.run_crawl(spark, root, seeds, robots, cfg, rounds=1)

    # blacklist the only crawl, then run another round
    bl = spark.createDataFrame(
        [("app-1", "crawl-1", "stop")], "appid string, crawlid string, reason string"
    )
    fmt.commit({"blacklist": bl}, meta=dict(fmt.meta()))
    seen_before = fmt.read("seen").count()
    frontier_before = fmt.read("frontier").count()

    stats = rj.run_round(fmt, cfg)
    assert stats["fetched"] > 0
    # no candidate survived the blacklist into the frontier — it only
    # shrank (popped rows leave; robots-dropped pops leave too)
    frontier_after = fmt.read("frontier").count()
    assert frontier_after <= frontier_before - stats["fetched"]
    assert stats["enqueued"] == 0
    # ...but the candidates WERE fingerprinted (seen grew)
    assert fmt.read("seen").count() > seen_before

    # lifting the blacklist cannot resurrect them: next round enqueues
    # only URLs never seen before
    fmt.commit({"blacklist": bl.limit(0)}, meta=dict(fmt.meta()))
    seen_mid = fmt.read("seen").select("url_hash").distinct()
    rj.run_round(fmt, cfg)
    new_frontier = fmt.read("frontier")
    resurrected = new_frontier.join(
        seen_mid, "url_hash", "left_semi"
    ).join(
        # exclude rows that were already in the frontier before
        fmt.read("frontier", snapshot_id=fmt.current_snapshot_id() - 1)
        .select("url_hash"),
        "url_hash",
        "left_anti",
    )
    assert resurrected.count() == 0
