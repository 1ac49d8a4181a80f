"""Parity under fetch failures: the retry stream (ST6) — priority
decay, re-enqueue after children, give-up at retry_max — must match
the oracle exactly, including crawl ordering and final frontier."""

import pytest

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.oracle import CrawlOracle
from openslack_crawler_spark.plans import round_job as rj

N_HOSTS, N_SEEDS, ROUNDS, K, MAXD = 15, 250, 4, 4, 2
FAILURE_MOD, RETRY_MAX = 17, 2


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("retryrun"))
    seeds = synthetic.gen_seeds(spark, N_SEEDS, n_hosts=N_HOSTS)
    robots = synthetic.gen_robots(spark, N_HOSTS)
    cfg = rj.CrawlConfig(
        n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD,
        failure_mod=FAILURE_MOD, retry_max=RETRY_MAX,
    )
    fmt = rj.run_crawl(spark, root, seeds, robots, cfg, rounds=ROUNDS)

    o = CrawlOracle(
        {
            r.host: {"crawl_delay": r.crawl_delay, "max_parallel": r.max_parallel,
                     "disallow": list(r.disallow)}
            for r in robots.collect()
        },
        n_hosts=N_HOSTS, k_per_host=K, maxdepth=MAXD,
        failure_mod=FAILURE_MOD, retry_max=RETRY_MAX,
    )
    o.bootstrap([(r.url, r.priority, r.enqueue_seq) for r in seeds.collect()])
    o.run(ROUNDS)
    return fmt, o


def test_retries_actually_happen(runs):
    fmt, o = runs
    frontier = fmt.read("frontier").collect()
    assert any(r.retry_times > 0 for r in frontier) or any(
        r.retry_times > 0 for r in o.frontier
    )


def test_crawl_ordering_with_failures(runs):
    fmt, o = runs
    so = [(r.round_id, r.url, r.fetch_at) for r in rj.crawl_order(fmt).collect()]
    oo = [(e["round"], e["url"], e["fetch_at"]) for e in o.fetch_log]
    assert so == oo


def test_frontier_with_retry_state(runs):
    fmt, o = runs
    sf = {(r.url, r.depth, r.priority, r.retry_times, r.enqueue_seq)
          for r in fmt.read("frontier").collect()}
    of = {(r.url, r.depth, r.priority, r.retry_times, r.enqueue_seq)
          for r in o.frontier}
    assert sf == of


def test_documents_only_for_successes(runs):
    fmt, o = runs
    spark_urls = {r.url for r in fmt.read("documents").select("url").collect()}
    assert spark_urls == set(o.documents)
