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


def test_fan_out_noop_when_input_is_large(spark):
    """Round-6 gate: fan_out decides from the optimizer's size estimate
    (~10ms) instead of df.rdd.getNumPartitions() (a full physical
    planning pass — measured 1.26s cold + ~50ms per text query at
    sf0.1). The no-op contract that matters at scale — never round-
    robin a LARGE input — is asserted via a tiny bytes_per_split so the
    10000-row fixture counts as 'large'."""
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(10000).repartition(target + 4)
    assert fan_out(wide, bytes_per_split=1) is wide


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


def test_star_edges_cc_equals_clique_pairs_cc(spark):
    """Round-5 star-edge switch: CC over minhash_band_star_edges must be
    bitwise-identical to CC over the clique-pair join — same node set
    (singleton buckets excluded) and same components — because that
    identity is what keeps the clique-pair recursive-CTE oracles valid
    for dedup_components / corpus_clean_fuzzy."""
    from openslack_crawler_spark.operators.components import connected_components
    from openslack_crawler_spark.queries_textdedup import (
        minhash_band_pairs,
        minhash_band_star_edges,
        words_col,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    # a 6-copy duplicate cluster (one bucket, clique would emit 15 pairs,
    # star emits 5 edges), a 2-doc near-dup pair, and 3 unique docs
    # (singleton buckets — must appear in NEITHER result)
    for i in range(6):
        rows.append((i, base))
    rows.append((10, base + " extra trailing words here"))
    rows.append((11, base + " extra trailing words here"))
    rows.append((20, "completely different text about spark shuffle partitions and join strategies"))
    rows.append((21, "another unrelated document mentioning parquet column pruning and codegen"))
    rows.append((22, "a third singleton with its own vocabulary entirely distinct tokens"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", words_col(F.col("text")).alias("w")
    )

    star = minhash_band_star_edges(docs)
    # star edges are linear in bucket size: the 6-clique contributes 5
    clique_pairs = minhash_band_pairs(docs)
    assert star.count() <= clique_pairs.count()

    cc_star = sorted(
        connected_components(star, src="doc_a", dst="doc_b").collect()
    )
    cc_clique = sorted(
        connected_components(clique_pairs, src="doc_a", dst="doc_b").collect()
    )
    assert cc_star == cc_clique
    nodes = {r["node"] for r in cc_star}
    assert {20, 21, 22}.isdisjoint(nodes)
    assert set(range(6)) <= nodes
