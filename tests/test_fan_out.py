"""fan_out (round 4): the conditional repartition that gives per-row-
expensive text stages full parallelism when the upstream scan has
fewer splits than cores — and stays OUT of the way when it doesn't."""

from pyspark.sql import functions as F

from openslack_crawler_spark.queries_textdedup import fan_out


def test_fan_out_widens_narrow_input(spark):
    one_part = spark.range(1000).coalesce(1)
    assert one_part.rdd.getNumPartitions() == 1
    widened = fan_out(one_part)
    assert (
        widened.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # row-preserving
    assert widened.count() == 1000
    assert widened.agg(F.sum("id")).collect()[0][0] == 499500


def test_fan_out_noop_when_already_wide(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(10000).repartition(target + 4)
    # already wider than the target: returned as-is, no extra shuffle
    assert fan_out(wide) is wide


def test_fan_out_respects_explicit_min_parts(spark):
    df = spark.range(100).coalesce(1)
    assert fan_out(df, min_parts=5).rdd.getNumPartitions() == 5


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_token_count_plan_is_exchange_free(spark):
    """Round-5: narrow-map text queries must not shuffle (the r4 fan_out
    Exchange doubled token_count's runtime; VERDICT r4 'What's wrong' #2)."""
    from openslack_crawler_spark.queries_textdedup import q_token_count

    plan = _executed_plan(q_token_count(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan[:800]


def test_quality_gopher_plan_is_exchange_free(spark):
    from openslack_crawler_spark.queries_textdedup import q_quality_gopher

    plan = _executed_plan(q_quality_gopher(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan[:800]


def test_simhash_plan_has_no_roundrobin_exchange(spark):
    """simhash keeps its two aggregation shuffles (hash partitioning on
    the groupBy keys) but must not round-robin the raw text column."""
    from openslack_crawler_spark.queries_textdedup import q_simhash

    plan = _executed_plan(q_simhash(spark, "/root/testdata/sf0.001"))
    assert "RoundRobinPartitioning" not in plan, plan[:800]
