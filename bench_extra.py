#!/usr/bin/env python
"""Round-6 extra benchmarks (guide §1: measure first, noop-sink
isolation). NOT part of the driver contract — bench.py stays frozen;
numbers from here are cited in OPTIMIZATION_r06.md.

Subcommands:
  --sched-stages [--urls N] [--cores N]   per-stage attribution of one
      scheduling round (the bench.py:sched_round_job pipeline), each
      stage materialized with the noop sink so we time computation.
  --sched-e2e [--urls N] [--cores N] [--reps R]  end-to-end rounds,
      same methodology as bench.py (warmup round + R timed rounds).
  --queries [name ...]   time declared queries at $SPARK_GRAFT_SF_DIR
      with .count() (bench methodology) and optionally dump plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _arg(flag: str, default):
    if flag in sys.argv:
        return type(default)(sys.argv[sys.argv.index(flag) + 1])
    return default


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def sched_stages(cores: int, n_urls: int) -> None:
    from pyspark.sql import functions as F

    from openslack_crawler_spark import synthetic
    from openslack_crawler_spark.functions.url import (
        canonicalize_udf,
        fixup_url,
        with_url_columns,
    )
    from openslack_crawler_spark.operators import frontier as fr
    from openslack_crawler_spark.operators.politeness import assign_fetch_slots
    from openslack_crawler_spark.operators.seen_filter import (
        filter_unseen,
        first_wins_dedup,
    )
    from openslack_crawler_spark.session import get_spark

    spark = get_spark(app_name=f"sched-stages-{cores}", cores=cores)
    sc = spark.sparkContext
    n_hosts = 20000

    # warmup: python workers + codegen, same as bench.py
    warm = spark.range(200000).repartition(cores).select(
        canonicalize_udf(
            F.concat(F.lit("HTTP://W.Example/p/"), F.col("id").cast("string"))
        ).alias("u")
    )
    for _ in range(3):
        warm.agg(F.max(F.length("u"))).collect()

    def seeds():
        return synthetic.gen_seeds(
            spark, n_urls, n_hosts=n_hosts, dup_frac=0.1, messy_frac=0.3
        )

    def pruned(cands):
        return cands.select(
            "url", "url_hash", "host_hash", "appid", "crawlid", "enqueue_seq",
            F.col("priority").cast("double").alias("score"),
        ).withColumn("dont_filter", F.lit(False))

    out = {}

    def stage(tag, df_fn, reps=2):
        sc.setJobDescription(f"stage:{tag}")
        secs = [noop(df_fn()) for _ in range(reps)]
        out[tag] = min(secs)
        print(f"  {tag:28s} {min(secs):7.3f}  {secs}", flush=True)
        sc.setJobDescription(None)

    stage("gen", seeds)
    stage("gen+fixup", lambda: seeds().withColumn("url", fixup_url(F.col("url"))))
    stage("gen+canon", lambda: seeds().withColumn(
        "url", canonicalize_udf(fixup_url(F.col("url")))))
    stage("gen+urlcols", lambda: with_url_columns(seeds(), "url", canonicalize=True))
    stage("..+prune", lambda: pruned(with_url_columns(seeds(), "url", canonicalize=True)))
    stage("..+dedup", lambda: first_wins_dedup(
        pruned(with_url_columns(seeds(), "url", canonicalize=True)), "enqueue_seq"))

    def seen():
        return (
            synthetic.gen_seeds(spark, n_urls // 4, n_hosts=n_hosts, dup_frac=0.0)
            .select("url")
            .select(F.xxhash64(F.col("url")).alias("url_hash"))
        )

    stage("seen_gen", seen)
    stage("..+antijoin", lambda: fr.with_salt(filter_unseen(first_wins_dedup(
        pruned(with_url_columns(seeds(), "url", canonicalize=True)),
        "enqueue_seq"), seen()), 16))

    # snapshot write + read + dequeue + slots (the tail of the round)
    import shutil
    import tempfile

    def tail_full():
        fresh = fr.with_salt(filter_unseen(first_wins_dedup(
            pruned(with_url_columns(seeds(), "url", canonicalize=True)),
            "enqueue_seq"), seen()), 16)
        snap = tempfile.mkdtemp(prefix="prof_snap_", dir="/dev/shm")
        try:
            t0 = time.perf_counter()
            fresh.write.mode("overwrite").parquet(snap)
            tw = time.perf_counter() - t0
            fresh2 = spark.read.parquet(snap)
            t0 = time.perf_counter()
            batch = fr.dequeue_top_k_per_host(fresh2, 8, salted=True)
            batch = assign_fetch_slots(batch, robots=None)
            n = batch.count()
            tt = time.perf_counter() - t0
            return tw, tt, n
        finally:
            shutil.rmtree(snap, ignore_errors=True)

    sc.setJobDescription("stage:snapshot+tail")
    best = None
    for _ in range(2):
        tw, tt, n = tail_full()
        if best is None or tw + tt < best[0] + best[1]:
            best = (tw, tt, n)
    out["snapshot_write"] = round(best[0], 3)
    out["dequeue+slots+count"] = round(best[1], 3)
    print(f"  {'snapshot_write':28s} {best[0]:7.3f}")
    print(f"  {'dequeue+slots+count':28s} {best[1]:7.3f}  rows={best[2]}")

    # end-to-end reference (bench methodology)
    import bench as bench_mod

    sc.setJobDescription("stage:e2e")
    e2e = []
    for _ in range(3):
        t0 = time.perf_counter()
        bench_mod.sched_round_job(spark, n_urls, n_hosts)
        e2e.append(round(time.perf_counter() - t0, 3))
    out["e2e"] = min(e2e)
    print(f"  {'e2e (3 rounds)':28s} {min(e2e):7.3f}  {e2e}")
    print("STAGEJSON:" + json.dumps({"cores": cores, "urls": n_urls, **out}))


def sched_e2e(cores: int, n_urls: int, reps: int) -> None:
    import bench as bench_mod
    from openslack_crawler_spark.session import get_spark

    spark = get_spark(app_name=f"sched-e2e-{cores}", cores=cores)
    from pyspark.sql import functions as F

    from openslack_crawler_spark.functions.url import canonicalize_udf

    warm = spark.range(200000).repartition(cores).select(
        canonicalize_udf(
            F.concat(F.lit("HTTP://W.Example/p/"), F.col("id").cast("string"))
        ).alias("u")
    )
    for _ in range(3):
        warm.agg(F.max(F.length("u"))).collect()
    bench_mod.sched_round_job(spark, max(n_urls // 8, 100000), 20000)
    secs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n = bench_mod.sched_round_job(spark, n_urls, 20000)
        secs.append(round(time.perf_counter() - t0, 3))
        print(f"  round {secs[-1]:.3f}s  scheduled={n}", flush=True)
    print("E2EJSON:" + json.dumps(
        {"cores": cores, "urls": n_urls, "secs": secs, "best": min(secs)}))


def time_queries(names: list[str]) -> None:
    import __spark_entry__ as entry
    from openslack_crawler_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-queries", cores=CPUS)
    from pyspark.sql import functions as F

    spark.range(100000).repartition(CPUS).select(
        F.xxhash64("id").alias("h")).agg(F.max("h")).collect()
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    qs = entry.queries()
    out = {}
    for name in names:
        secs = []
        for _ in range(int(os.environ.get("QREPS", "2"))):
            spark.sparkContext.setJobDescription(f"q:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            secs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(secs)
        print(f"  {name:28s} {min(secs):7.3f}  {secs}", flush=True)
    print("QJSON:" + json.dumps(out))


if __name__ == "__main__":
    if "--sched-stages" in sys.argv:
        sched_stages(_arg("--cores", CPUS), _arg("--urls", 32000000))
    elif "--sched-e2e" in sys.argv:
        sched_e2e(_arg("--cores", CPUS), _arg("--urls", 32000000),
                  _arg("--reps", 3))
    elif "--queries" in sys.argv:
        idx = sys.argv.index("--queries")
        names = sys.argv[idx + 1:]
        if not names:
            import bench as bench_mod
            names = bench_mod.BENCH_QUERIES
        time_queries(names)
