"""Hot-host skew handling (north_rule: salted repartitioning breaks
hot-host skew; SURVEY.md §5.5 scale/skew smoke)."""

from pyspark.sql import functions as F

from openslack_crawler_spark import synthetic
from openslack_crawler_spark.operators import frontier as fr


def _skewed_frontier(spark, n=60000, hosts=50):
    """Zipf(2) generator: rank-1 host carries ~half the mass."""
    seeds = synthetic.gen_seeds(spark, n, n_hosts=hosts)
    return (
        seeds.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host_hash", F.xxhash64(F.regexp_extract("url", r"(host-\d+)", 1)))
        .withColumn("score", F.col("priority").cast("double"))
        .withColumn("dont_filter", F.lit(False))
    )


def test_generator_is_actually_skewed(spark):
    f = _skewed_frontier(spark)
    counts = f.groupBy("host_hash").count()
    top = counts.agg(F.max("count")).collect()[0][0]
    total = f.count()
    assert top > total * 0.3  # hot host holds a big share — skew is real


def test_salt_bounds_rank_groups(spark):
    """The per-(host,salt) rank groups must be ~buckets× smaller than
    the hot host itself — the phase-1 window never sees the full key."""
    buckets = 16
    f = fr.with_salt(_skewed_frontier(spark), buckets)
    per_host = {r.host_hash: r["count"] for r in f.groupBy("host_hash").count().collect()}
    hot_host, hot_n = max(per_host.items(), key=lambda kv: kv[1])
    per_salt = (
        f.filter(F.col("host_hash") == hot_host)
        .groupBy("salt").count().collect()
    )
    max_salt_group = max(r["count"] for r in per_salt)
    assert len(per_salt) == buckets
    assert max_salt_group < hot_n / buckets * 1.5  # evenly spread (±50%)


def test_salted_phase2_input_is_bounded(spark):
    """Phase 2 (per-host merge) receives ≤ buckets*k rows per host, no
    matter how hot the host — constant-bounded shuffle for the merge."""
    k, buckets = 8, 16
    f = fr.with_salt(_skewed_frontier(spark), buckets)
    from pyspark.sql import Window

    w_local = Window.partitionBy("host_hash", "salt").orderBy(*fr.dequeue_order())
    local = (
        f.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
    )
    phase2_sizes = local.groupBy("host_hash").count().agg(F.max("count")).collect()[0][0]
    assert phase2_sizes <= buckets * k

    # and the final result still equals the unsalted ground truth
    a = {r.url for r in fr.dequeue_top_k_per_host(f, k, salted=True).collect()}
    b = {r.url for r in fr.dequeue_top_k_per_host(f.drop("salt"), k, salted=False).collect()}
    assert a == b
