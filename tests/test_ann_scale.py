"""ANN scale knobs (round-1 verdict): LSH plane count and IVF cell
count must derive from corpus size — toy constants make buckets O(N)
at 10^10 vectors. Mirrors test_skew.py's occupancy-bound style for the
vector path."""

import math

from pyspark.sql import functions as F

from openslack_crawler_spark.queries_ivf import (
    k_cells_for,
    q_ann_ivf_topk,
    sample_centroids,
)
from openslack_crawler_spark.queries_similarity import (
    N_PLANES,
    n_planes_for,
    q_lsh_buckets,
)
from openslack_crawler_spark.queries_textdedup import h60

SF0001 = "/root/testdata/sf0.001"


def test_knob_derivation_math():
    # sandbox SFs stay on the clamped minimum → static SQL oracles hold
    assert n_planes_for(500) == N_PLANES
    assert n_planes_for(2000) == N_PLANES
    assert n_planes_for(32768) == N_PLANES
    # web scale: 2^planes tracks n/target
    assert n_planes_for(10**10) == 23
    assert n_planes_for(10**10, target_bucket=512) == 25
    assert n_planes_for(2**80) == 62  # bigint bitmask cap
    # IVF cells ~ sqrt(N)
    assert k_cells_for(500) == 22
    assert k_cells_for(10**10) == 10**5
    assert k_cells_for(10) == 16  # floor


def _skewed_embeddings(spark, n, dim=16, bias=0.35):
    """Deterministic pseudo-random vectors with a directional bias on
    dim 0 (nonuniform mass — the vector analogue of the Zipf hosts)."""
    comp = lambda i: (  # noqa: E731
        F.pmod(h60(F.concat(F.col("vec_id").cast("string"), F.lit("_"), F.lit(str(i)))), F.lit(2001)) - 1000
    ) / 1000.0 + (bias if i == 0 else 0.0)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(i).cast("float") for i in range(dim)]).alias("embedding"),
    )


def test_derived_planes_bound_bucket_occupancy(spark, tmp_path):
    """With derived planes the hottest LSH bucket stays near the target
    size; the clamped minimum (4 planes = 16 buckets) would hold ~n/16
    rows — the O(N²/16) within-bucket join the verdict flagged."""
    n, target = 20000, 64
    emb = _skewed_embeddings(spark, n)
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    sf_dir = str(tmp_path)

    planes = n_planes_for(n, target_bucket=target)
    assert planes == 9  # 512 buckets for 20k vectors

    occ4 = (
        q_lsh_buckets(spark, sf_dir, n_planes=4)
        .groupBy("bucket").count().agg(F.max("count")).collect()[0][0]
    )
    occ_derived = (
        q_lsh_buckets(spark, sf_dir, n_planes=planes)
        .groupBy("bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert occ4 > n / 16 * 0.5  # the toy config really does blow up
    assert occ_derived <= occ4 / 4  # derived planes split the hot mass
    assert occ_derived <= n / 32  # absolute occupancy bound


def test_sampled_centroids_are_spread_not_prefix(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    cells = sorted(r.cell for r in sample_centroids(emb, 22).collect())
    assert len(cells) == 22
    # a hash-ordered sample must not be the id prefix 0..21
    assert cells != list(range(22))
    assert max(cells) > 100  # spread across the id space


def test_numpy_assign_kernel_matches_expression_path(spark):
    """The Arrow-batched matmul assignment (the K~10^5 scale kernel)
    must produce the same top-k as the fold-based expression path."""
    expr_rows = sorted(
        tuple(r) for r in q_ann_ivf_topk(spark, SF0001).collect()
    )
    np_rows = sorted(
        tuple(r)
        for r in q_ann_ivf_topk(spark, SF0001, use_numpy_assign=True).collect()
    )
    assert np_rows == expr_rows


def test_numpy_lsh_projection_matches_expression_path(spark):
    """The Arrow-batched matmul projection (round-3 verdict #4) must be
    bit-exact vs the explode/groupBy expression path — the projection is
    pure integer arithmetic, so buckets must AGREE EXACTLY, at the
    clamped minimum and at a derived-scale plane count."""
    for planes in (4, 9):
        expr = {
            (r.vec_id, r.bucket)
            for r in q_lsh_buckets(
                spark, SF0001, n_planes=planes, use_numpy_project=False
            ).collect()
        }
        np_ = {
            (r.vec_id, r.bucket)
            for r in q_lsh_buckets(
                spark, SF0001, n_planes=planes, use_numpy_project=True
            ).collect()
        }
        assert np_ == expr, f"planes={planes}"


def test_exact_topk_kernel_matches_brute_force(spark):
    """The registered ann_cosine_topk (per-batch kernel + survivor
    window, round-4 de-fang of the crossJoin) must equal the test-only
    global crossJoin twin bitwise — the kernel's in-order column fold is
    the same float64 op sequence as cosine_expr's F.aggregate fold."""
    from openslack_crawler_spark.queries_similarity import (
        q_ann_cosine_topk,
        q_brute_force_cosine_topk,
    )

    kernel = sorted(tuple(r) for r in q_ann_cosine_topk(spark, SF0001).collect())
    brute = sorted(
        tuple(r) for r in q_brute_force_cosine_topk(spark, SF0001).collect()
    )
    assert kernel == brute
    assert len(kernel) == 50


def test_no_cartesian_product_in_any_registered_query(spark):
    """No registered query may plan a CartesianProduct or an unbounded
    BroadcastNestedLoopJoin (round-3 verdict #3): every candidate
    generation must be bounded (equi-join on bucket/band/cell, kernel
    scan, or broadcast of a provably small side)."""
    import __spark_entry__ as entry

    offenders = {}
    for name, fn in entry.queries().items():
        if name == "crawl_e2e":  # stateful multi-round job, not one plan
            continue
        df = fn(spark, SF0001)
        mode = spark.sparkContext._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders[name] = [
                ln.strip()
                for ln in plan.splitlines()
                if "CartesianProduct" in ln or "BroadcastNestedLoopJoin" in ln
            ][:2]
    assert not offenders, offenders


def test_numpy_multiband_matches_expression_path(spark):
    from openslack_crawler_spark.queries_similarity import q_ann_lsh_multiband_topk

    expr = sorted(
        tuple(r)
        for r in q_ann_lsh_multiband_topk(
            spark, SF0001, n_planes=6, use_numpy_project=False
        ).collect()
    )
    np_ = sorted(
        tuple(r)
        for r in q_ann_lsh_multiband_topk(
            spark, SF0001, n_planes=6, use_numpy_project=True
        ).collect()
    )
    assert np_ == expr


def test_recall_report_self_recall_is_exact(spark):
    """recall(exact vs exact) must be exactly 1.0 for every query —
    the report's arithmetic is wrong if this is off by even a micro."""
    from openslack_crawler_spark.queries_recall import recall_vs_exact
    from openslack_crawler_spark.queries_similarity import q_ann_cosine_topk

    exact = q_ann_cosine_topk(spark, SF0001)
    row = recall_vs_exact(exact, exact, "self").collect()[0]
    assert row["mean_recall_micro"] == 1_000_000
    assert row["min_recall_micro"] == 1_000_000


def test_recall_report_floors(spark):
    """Recall floors at the registered operating points (VERDICT r4
    task 6). The honest currency: single-table LSH is weak by design
    (one bucket probe), multiband and IVF must clear a real floor."""
    from openslack_crawler_spark.queries_recall import q_ann_recall_report

    rows = {r["method"]: r for r in q_ann_recall_report(spark, SF0001).collect()}
    assert set(rows) == {"lsh", "lsh_multiband", "ivf"}
    for r in rows.values():
        assert r["n_queries"] == 10
        assert 0 <= r["min_recall_micro"] <= r["mean_recall_micro"] <= 1_000_000
    # measured sf0.001: lsh 140k, multiband 280k, ivf 300k (mean micro)
    assert rows["lsh_multiband"]["mean_recall_micro"] >= 200_000
    assert rows["ivf"]["mean_recall_micro"] >= 200_000
    assert rows["ivf"]["mean_recall_micro"] >= rows["lsh"]["mean_recall_micro"]
