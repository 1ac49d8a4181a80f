"""Parity with the bloom prefilter ENABLED in the round job: the bloom
must be invisible in results (prefilter, never decider) even through
multi-round crawls with incremental bitmap maintenance."""

import pytest

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.oracle import CrawlOracle
from openslack_crawler_spark.plans import round_job as rj

N_HOSTS, N_SEEDS, ROUNDS, K, MAXD = 15, 200, 3, 4, 2


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    seeds = synthetic.gen_seeds(spark, N_SEEDS, n_hosts=N_HOSTS)
    robots = synthetic.gen_robots(spark, N_HOSTS)
    cfg = rj.CrawlConfig(
        n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD, use_bloom=True
    )
    fmt = rj.run_crawl(
        spark, str(tmp_path_factory.mktemp("bloomrun")), seeds, robots, cfg,
        rounds=ROUNDS,
    )
    o = CrawlOracle(
        {
            r.host: {"crawl_delay": r.crawl_delay, "max_parallel": r.max_parallel,
                     "disallow": list(r.disallow)}
            for r in robots.collect()
        },
        n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD,
    )
    o.bootstrap([(r.url, r.priority, r.enqueue_seq) for r in seeds.collect()])
    o.run(ROUNDS)
    return fmt, o


def test_bloom_round_job_ordering_parity(runs):
    fmt, o = runs
    so = [(r.round_id, r.url, r.fetch_at) for r in rj.crawl_order(fmt).collect()]
    oo = [(e["round"], e["url"], e["fetch_at"]) for e in o.fetch_log]
    assert so == oo


def test_bloom_round_job_frontier_parity(runs):
    fmt, o = runs
    sf = {(r.url, r.enqueue_seq) for r in fmt.read("frontier").collect()}
    of = {(r.url, r.enqueue_seq) for r in o.frontier}
    assert sf == of
    assert fmt.read("bloom") is not None  # the bloom table really existed
