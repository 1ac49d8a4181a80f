"""Multiple concurrent crawls in one frontier: stop/info act on the
(appid, crawlid) pair only (J3/F4 semantics, redis-monitor purge)."""

from pyspark.sql import functions as F

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.plans import monitor, round_job as rj


def test_stop_one_crawl_leaves_the_other(spark, tmp_path):
    seeds_a = synthetic.gen_seeds(spark, 100, n_hosts=10, crawlid="crawl-A", appid="app")
    seeds_b = synthetic.gen_seeds(
        spark, 100, n_hosts=10, crawlid="crawl-B", appid="app", seed=77
    ).withColumn("enqueue_seq", F.col("enqueue_seq") + 100)
    seeds = seeds_a.unionByName(seeds_b)
    robots = synthetic.gen_robots(spark, 10)
    cfg = rj.CrawlConfig(n_hosts=10, k_per_host=3, maxdepth=1)
    fmt = rj.run_crawl(spark, str(tmp_path / "mc"), seeds, robots, cfg, rounds=1)

    info = {
        (r.appid, r.crawlid): r.total_pending
        for r in monitor.info_all(fmt.read("frontier")).collect()
    }
    assert ("app", "crawl-A") in info and ("app", "crawl-B") in info

    monitor.stop_crawl(fmt, "app", "crawl-A")
    left = fmt.read("frontier")
    assert left.filter(F.col("crawlid") == "crawl-A").count() == 0
    assert left.filter(F.col("crawlid") == "crawl-B").count() == info[("app", "crawl-B")]

    # blacklisted crawl's future candidates are dropped at enqueue (F4)
    stats = rj.run_round(fmt, cfg)
    assert stats["fetched"] >= 0
    post = fmt.read("frontier")
    assert post.filter(F.col("crawlid") == "crawl-A").count() == 0
