"""Deep-crawl parity: maxdepth=3 (the schema's cap,
scraper_schema.json:22-26), 6 rounds — exercises the dense-sequence
assignment and priority decay through three generations of expansion."""

import pytest

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.oracle import CrawlOracle
from openslack_crawler_spark.plans import round_job as rj

N_HOSTS, N_SEEDS, ROUNDS, K, MAXD = 12, 150, 6, 3, 3


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deep"))
    seeds = synthetic.gen_seeds(spark, N_SEEDS, n_hosts=N_HOSTS)
    robots = synthetic.gen_robots(spark, N_HOSTS)
    cfg = rj.CrawlConfig(n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD)
    fmt = rj.run_crawl(spark, root, seeds, robots, cfg, rounds=ROUNDS)
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


def test_deep_ordering(runs):
    fmt, o = runs
    so = [(r.round_id, r.url, r.fetch_at) for r in rj.crawl_order(fmt).collect()]
    oo = [(e["round"], e["url"], e["fetch_at"]) for e in o.fetch_log]
    assert len(so) > 100  # enough depth to be meaningful
    assert so == oo


def test_depth_three_reached_and_capped(runs):
    fmt, o = runs
    fetched_depths = {r.depth for r in fmt.read("fetch_log").collect()}
    assert max(fetched_depths) <= MAXD
    assert max(e["depth"] for e in o.fetch_log) <= MAXD
    # generation-3 candidates exist in the frontier (even if the
    # priority backlog hasn't fetched them within 6 rounds)
    frontier_depths = {r.depth for r in fmt.read("frontier").collect()}
    assert max(frontier_depths | fetched_depths) == MAXD
    assert all(d <= MAXD for d in frontier_depths)


def test_deep_frontier_parity(runs):
    fmt, o = runs
    sf = {(r.url, r.depth, r.priority, r.enqueue_seq) for r in fmt.read("frontier").collect()}
    of = {(r.url, r.depth, r.priority, r.enqueue_seq) for r in o.frontier}
    assert sf == of
