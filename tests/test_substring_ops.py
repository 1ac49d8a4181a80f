"""Substring-level dedup + winnowing + source prior (round 5).

Semantics pinned here (the sf0.01 oracle twins check cross-engine
agreement; these fixtures check the MATH on corpora built to exercise
span merging, the MOSS detection guarantee, and the prior arithmetic).
"""

from pyspark.sql import functions as F

from openslack_crawler_spark.queries_substring import (
    SPAN_K,
    WINNOW_K,
    WINNOW_W,
    _fps_col,
    q_source_quality_prior,
    q_substring_dup_spans,
    q_winnow_fingerprints,
    q_winnow_shared_pairs,
)
from openslack_crawler_spark.queries_textdedup import words_col


def _wordstream(prefix: str, n: int) -> str:
    # deterministic, pairwise-distinct filler words
    return " ".join(f"{prefix}{i:04d}" for i in range(n))


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dup_spans_merge_to_maximal_span(spark, tmp_path):
    """Two docs share a 12-word run → every SPAN_K-window inside the
    run is duplicated, and the overlapping windows must merge into ONE
    maximal span of exactly 12 words per doc."""
    shared = _wordstream("dup", 12)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, _wordstream("a", 20) + " " + shared + " " + _wordstream("b", 20), "en", "s1"),
            (2, _wordstream("c", 5) + " " + shared + " " + _wordstream("d", 30), "en", "s1"),
        ],
    )
    rows = {r["doc_id"]: r for r in q_substring_dup_spans(spark, sf).collect()}
    assert set(rows) == {1, 2}
    # doc 1: shared run occupies word positions 21..32
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (21, 32)
    assert rows[1]["span_words"] == 12
    assert rows[1]["n_windows"] == 12 - SPAN_K + 1
    # doc 2: positions 6..17
    assert (rows[2]["span_start"], rows[2]["span_end"]) == (6, 17)


def test_dup_spans_within_doc_and_island_split(spark, tmp_path):
    """Lee et al. count ANY recurrence: a doc repeating its own 8-gram
    far apart gets TWO spans (the gap exceeds SPAN_K, so no merge)."""
    run = _wordstream("rep", SPAN_K)
    text = run + " " + _wordstream("x", 40) + " " + run
    sf = _write_docs(spark, tmp_path, [(1, text, "en", "s1")])
    spans = sorted(
        q_substring_dup_spans(spark, sf).collect(), key=lambda r: r["span_start"]
    )
    assert len(spans) == 2
    assert (spans[0]["span_start"], spans[0]["span_end"]) == (1, SPAN_K)
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (49, 48 + SPAN_K)
    assert all(s["span_words"] == SPAN_K and s["n_windows"] == 1 for s in spans)


def test_dup_spans_no_false_positives(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, _wordstream("only1x", 50), "en", "s1"),
            (2, _wordstream("only2x", 50), "en", "s1"),
        ],
    )
    assert q_substring_dup_spans(spark, sf).count() == 0


def test_winnow_moss_guarantee(spark, tmp_path):
    """MOSS guarantee: any shared run of >= WINNOW_W + WINNOW_K - 1
    words yields at least one SHARED fingerprint. Checked directly on
    the fingerprint sets (the registered pair query adds a >=2-shared
    threshold on top)."""
    t = WINNOW_W + WINNOW_K - 1  # guarantee threshold, in words
    shared = _wordstream("g", t)
    docs = spark.createDataFrame(
        [
            (1, _wordstream("p", 30) + " " + shared + " " + _wordstream("q", 30)),
            (2, _wordstream("r", 11) + " " + shared + " " + _wordstream("s", 17)),
        ],
        "doc_id bigint, text string",
    ).select("doc_id", words_col(F.col("text")).alias("w"))
    _hs, fps = _fps_col()
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select("doc_id", fps.alias("fps")).collect()
    }
    assert sets[1] & sets[2], "shared run >= W+K-1 words must share a fingerprint"


def test_winnow_density_and_summary(spark, tmp_path):
    """Winnowing selects far fewer fingerprints than k-grams (expected
    density 2/(W+1)) and the summary columns are internally coherent."""
    sf = _write_docs(
        spark, tmp_path, [(1, _wordstream("w", 400), "en", "s1")]
    )
    row = q_winnow_fingerprints(spark, sf).collect()[0]
    assert row["n_kgrams"] == 400 - WINNOW_K + 1
    assert 0 < row["n_fp"] <= row["n_kgrams"]
    # 2/(W+1) = 0.4 expected; allow generous slack either side
    assert row["n_fp"] < 0.6 * row["n_kgrams"]
    assert row["min_fp"] <= row["max_fp"]


def test_winnow_shared_pairs_detects_plagiarism(spark, tmp_path):
    """A 20-word copied run produces a pair with n_shared >= 2; unrelated
    docs never pair."""
    shared = _wordstream("copy", 20)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, _wordstream("a", 40) + " " + shared, "en", "s1"),
            (2, shared + " " + _wordstream("b", 40), "en", "s1"),
            (3, _wordstream("c", 60), "en", "s1"),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in
             q_winnow_shared_pairs(spark, sf).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_winnow_fingerprints_plan_shape(spark, tmp_path):
    """Round-5 redesign: the selection runs as codegen explode + sliding
    window-min (the row-local lambda version interprets an md5 per
    element — 6-20x slower, see PLANS.md). Contract now: NO Python
    evals anywhere, and every Exchange carries only ids/hashes — the
    words array (the text payload) must never appear in a shuffle
    output, so the gram text stays inside its scan task."""
    sf = _write_docs(
        spark, tmp_path, [(i, _wordstream("w", 50), "en", "s1") for i in range(8)]
    )
    plan = (
        q_winnow_fingerprints(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan[:800]
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "w#" not in m.group(1), m.group(0)


def test_source_quality_prior_arithmetic(spark, tmp_path):
    """Hand-computed priors: a clean English source is kept, a
    repetitive non-English one is dropped."""
    clean = _wordstream("clean", 60)          # 60 distinct words
    junk = " ".join(["spam"] * 80)            # 80 words, 1 distinct
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, clean, "en", "good"),
            (2, clean + " extra", "en", "good"),
            (3, junk, "de", "bad"),
        ],
    )
    rows = {r["source"]: r for r in q_source_quality_prior(spark, sf).collect()}
    good, bad = rows["good"], rows["bad"]
    assert (good["n_docs"], good["mean_words"]) == (2, 60)  # (60+61) DIV 2
    assert good["dup_micro_mean"] == 0
    assert good["en_frac_micro"] == 1000000
    assert good["prior_micro"] == 1100000 and good["keep_src"] == 1
    # bad: dup = floor(79e6/80) = 987500; prior = 0 - 2*987500 + 100000
    assert bad["dup_micro_mean"] == 987500
    assert bad["prior_micro"] == -1875000 and bad["keep_src"] == 0


def test_winnow_codegen_plan_matches_lambda_reference(spark):
    """The registered winnowing plan (explode + sliding window-min,
    _winnow_fps_df) must select bit-identical fingerprints to the
    row-local lambda reference (_fps_col) — same (doc, fp) multiset."""
    import tempfile

    from pyspark.sql import functions as F

    from openslack_crawler_spark.queries_substring import (
        _fps_col,
        _winnow_fps_df,
    )
    from openslack_crawler_spark.queries_textdedup import _t, fan_out, words_col

    sf = "/root/testdata/sf0.001"
    fast = _winnow_fps_df(spark, sf)
    # reference path needs the CollapseProject fence (non-deterministic
    # marker column) so the row-local lambda doesn't re-tokenize per
    # element — test-only, lives here since advisor r5 flagged the
    # module-level helper as dead code
    docs = fan_out(_t(spark, sf, "documents")).select(
        "doc_id",
        words_col(F.col("text")).alias("w"),
        F.monotonically_increasing_id().alias("_nocollapse"),
    )
    _hs, fps = _fps_col()
    ref = docs.select("doc_id", F.explode(fps).alias("fp"))

    def sig(df):
        return df.agg(
            F.sum(F.col("fp").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id", "fp").cast("decimal(38,0)")).alias("x"),
        ).collect()[0]

    assert tuple(sig(fast)) == tuple(sig(ref))
