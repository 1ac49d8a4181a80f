#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.json scaling evidence).

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl
scheduling-round throughput job at TWO parallelism levels (local[8] and
local[32] — the sandbox stand-in for N and 4N executors), and prints
ONE JSON line:

  {"metric": "...", "value": <sched urls/sec at high parallelism>,
   "unit": "sec", "queries": {...per-query sec...}, "sf": ...,
   "scaling": {"cores_low": 8, "cores_high": 32, "urls_per_sec_low": ...,
               "urls_per_sec_high": ..., "efficiency": ...}}

Each parallelism level runs in a fresh subprocess (one JVM per master
setting). Inner mode: `bench.py --sched-bench --cores N --urls M`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_URLS = int(os.environ.get("BENCH_URLS", "32000000"))
N_HOSTS = 20000
CORES_LOW, CORES_HIGH = 8, 32

# headline per-query timings (a representative slice of queries();
# the full registry is exercised by the correctness gate)
BENCH_QUERIES = [
    "seen_antijoin",
    "dequeue_topk_per_host",
    "politeness_slots",
    "terms_agg_stats",
    "merge_upsert",
    "minhash_lsh_pairs",
    "dedup_components",
    "simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "token_count",
    "quality_gopher",
    "bloom_prefilter_dedup",
]


def sched_round_job(spark, n_urls: int, n_hosts: int) -> int:
    """One full scheduling round, set-oriented: canonicalize+hash →
    intra-batch first-wins dedup → seen anti-join → salted per-host
    top-k dequeue → politeness slots. Returns rows scheduled."""
    from pyspark.sql import functions as F

    from openslack_crawler_spark import synthetic
    from openslack_crawler_spark.functions.url import with_url_columns
    from openslack_crawler_spark.operators import frontier as fr
    from openslack_crawler_spark.operators.politeness import assign_fetch_slots
    from openslack_crawler_spark.operators.seen_filter import (
        filter_unseen,
        first_wins_dedup,
    )

    seeds = synthetic.gen_seeds(
        spark, n_urls, n_hosts=n_hosts, dup_frac=0.1, messy_frac=0.3
    )
    cands = with_url_columns(seeds, "url", canonicalize=True)
    cands = cands.withColumn("dont_filter", F.lit(False)).withColumn(
        "score", F.col("priority").cast("double")
    )
    cands = first_wins_dedup(cands, "enqueue_seq")
    # seen set: ~25% of the URL space already crawled
    seen = (
        synthetic.gen_seeds(spark, n_urls // 4, n_hosts=n_hosts, dup_frac=0.0)
        .select("url")
        .select(F.xxhash64(F.col("url")).alias("url_hash"))
    )
    fresh = filter_unseen(cands, seen)
    fresh = fr.with_salt(fresh, 16)
    # materialize once as a parquet snapshot — exactly what a round
    # commit does (table_format), and unlike localCheckpoint it stays
    # off-heap/compressed instead of exploding the JVM heap at high
    # task concurrency
    import tempfile

    snap = tempfile.mkdtemp(prefix="bench_snap_")
    fresh.write.mode("overwrite").parquet(snap)
    fresh = spark.read.parquet(snap)
    try:
        batch = fr.dequeue_top_k_per_host(fresh, 8, salted=True)
        batch = assign_fetch_slots(batch, robots=None)
        return batch.count()
    finally:
        import shutil

        shutil.rmtree(snap, ignore_errors=True)


def run_sched_bench(cores: int, n_urls: int) -> dict:
    from openslack_crawler_spark.session import get_spark

    spark = get_spark(app_name=f"sched-bench-{cores}", cores=cores)
    # Warm the JVM + the python-worker pool at FULL parallelism before
    # timing: local-mode workers spawn lazily over the first couple of
    # stages, which would charge one-off fork/import cost to the
    # measured job. A real cluster's executors keep long-lived warm
    # workers, so steady-state is the honest number.
    from pyspark.sql import functions as F

    from openslack_crawler_spark.functions.url import canonicalize_udf

    warm = spark.range(200000).repartition(cores).select(
        canonicalize_udf(
            F.concat(F.lit("HTTP://W.Example/p/"), F.col("id").cast("string"))
        ).alias("u")
    )
    for _ in range(3):
        warm.agg(F.max(F.length("u"))).collect()
    # one warmup round of the same plan shape (JIT + codegen + worker
    # pool), then two timed rounds, best-of — a crawl runs thousands of
    # rounds, so steady-state throughput is the meaningful number and
    # best-of-2 suppresses one-off stragglers (GC, page cache)
    sched_round_job(spark, max(n_urls // 8, 100000), N_HOSTS)
    times = []
    scheduled = 0
    for _ in range(2):
        t0 = time.perf_counter()
        scheduled = sched_round_job(spark, n_urls, N_HOSTS)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "cores": cores,
        "urls_in": n_urls,
        "scheduled": scheduled,
        "sec": dt,
        "all_secs": [round(t, 3) for t in times],
        "urls_per_sec": n_urls / dt,
    }


def run_query_bench() -> dict:
    import __spark_entry__ as entry
    from openslack_crawler_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cores=CPUS)
    qs = entry.queries()
    out = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.perf_counter() - t0, 3)
        _ = n
    return out


def main():
    if "--sched-bench" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        urls = int(sys.argv[sys.argv.index("--urls") + 1])
        print("SCHEDJSON:" + json.dumps(run_sched_bench(cores, urls)))
        return

    queries = run_query_bench()

    scaling = {}
    results = {}
    import shutil as _shutil

    for cores in (CORES_LOW, CORES_HIGH):
        cmd = [sys.executable, os.path.abspath(__file__), "--sched-bench",
               "--cores", str(cores), "--urls", str(N_URLS)]
        if _shutil.which("taskset"):
            # pin the whole process tree (JVM + python workers) to a
            # `cores`-wide CPU budget: an unpinned local[8] on a 32-core
            # box borrows the idle cores and understates scaling
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("SCHEDJSON:"):
                results[cores] = json.loads(line[len("SCHEDJSON:"):])
                break
        else:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise RuntimeError(f"sched bench at {cores} cores produced no result")
    low, high = results[CORES_LOW], results[CORES_HIGH]
    speedup = low["sec"] / high["sec"]
    scaling = {
        "cores_low": CORES_LOW,
        "cores_high": CORES_HIGH,
        "urls_per_sec_low": round(low["urls_per_sec"]),
        "urls_per_sec_high": round(high["urls_per_sec"]),
        "sec_low": round(low["sec"], 3),
        "sec_high": round(high["sec"], 3),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (CORES_HIGH / CORES_LOW), 3),
        "urls": N_URLS,
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "URLs scheduled+deduped/sec (one full scheduling round: canonicalize, hash, dedup, seen anti-join, salted top-k dequeue, politeness)",
                "value": scaling["sec_high"],
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "urls_per_sec": scaling["urls_per_sec_high"],
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
