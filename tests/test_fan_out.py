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
