"""Kill/resume exactness (ST5, north_rule 'resumable from checkpoint')
and monitor actions (info/stop/expire) over the snapshot store."""

import pytest
from pyspark.sql import functions as F

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.plans import monitor, round_job as rj

N_HOSTS, N_SEEDS, K, MAXD, ROUNDS = 15, 200, 4, 2, 3


def _run(spark, root, rounds, resume=False):
    seeds = synthetic.gen_seeds(spark, N_SEEDS, n_hosts=N_HOSTS)
    robots = synthetic.gen_robots(spark, N_HOSTS)
    cfg = rj.CrawlConfig(n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD)
    return rj.run_crawl(spark, root, seeds, robots, cfg, rounds=rounds, resume=resume)


def test_kill_resume_exactness(spark, tmp_path):
    full = _run(spark, str(tmp_path / "full"), ROUNDS)
    _run(spark, str(tmp_path / "kill"), 1)  # "killed" after round 1
    resumed = _run(spark, str(tmp_path / "kill"), ROUNDS, resume=True)

    fo = [(r.round_id, r.url) for r in rj.crawl_order(full).collect()]
    ro = [(r.round_id, r.url) for r in rj.crawl_order(resumed).collect()]
    assert fo == ro
    assert {r.url_hash for r in full.read("seen").collect()} == {
        r.url_hash for r in resumed.read("seen").collect()
    }
    assert {r.url for r in full.read("frontier").collect()} == {
        r.url for r in resumed.read("frontier").collect()
    }


@pytest.fixture()
def crawl_fmt(spark, tmp_path):
    return _run(spark, str(tmp_path / "mon"), 2)


def test_info_aggregates(spark, crawl_fmt):
    info = monitor.info_all(crawl_fmt.read("frontier")).collect()
    assert len(info) == 1  # one (appid, crawlid) in the fixture
    row = info[0]
    assert row.total_pending > 0
    assert row.high_priority >= row.low_priority


def test_stop_purges_and_blacklists(spark, crawl_fmt):
    before = crawl_fmt.read("frontier").count()
    assert before > 0
    monitor.stop_crawl(crawl_fmt, "app-1", "crawl-1")
    assert crawl_fmt.read("frontier").count() == 0
    bl = crawl_fmt.read("blacklist").collect()
    assert [(b.appid, b.crawlid, b.reason) for b in bl] == [("app-1", "crawl-1", "stop")]
    # snapshot lineage intact: pre-stop frontier still readable
    prev = crawl_fmt.current_snapshot_id() - 1
    assert crawl_fmt.read("frontier", snapshot_id=prev).count() == before


def test_expire_drops_only_expired(spark, crawl_fmt):
    frontier = crawl_fmt.read("frontier")
    n = frontier.count()
    # mark half the rows as already expired
    marked = frontier.withColumn(
        "expires",
        F.when(F.pmod("enqueue_seq", F.lit(2)) == 0,
               F.lit("2000-01-01").cast("timestamp")),
    )
    meta = dict(crawl_fmt.meta())
    crawl_fmt.commit({"frontier": marked}, meta=meta)
    monitor.expire_crawls(crawl_fmt)
    left = crawl_fmt.read("frontier")
    assert left.filter(F.col("expires").isNotNull()).count() == 0
    assert 0 < left.count() < n
    assert {b.reason for b in crawl_fmt.read("blacklist").collect()} == {"expire"}


def test_counters_rollup(spark, crawl_fmt):
    roll = monitor.counters_rollup(crawl_fmt.read("counters"))
    rows = {(r.round_id, r.metric): r.value for r in roll.collect()}
    assert all(v > 0 for v in rows.values())
    assert any(m == "scheduler/dequeued" for (_, m) in rows)
