"""Pretraining-corpus assembly ops (queries_pretrain): invariants the
DuckDB hash-match can't see — determinism across runs, packing laws,
contamination direction, and the plan shapes that carry the 100 TB
claims (no shuffle in sampling, broadcast in decontamination)."""

from pyspark.sql import functions as F

from openslack_crawler_spark.queries_pretrain import (
    SHARD_BUCKETS,
    SHARD_TOKEN_BUDGET,
    q_corpus_sample_stratified,
    q_corpus_shard_pack,
    q_decontaminate_overlap,
    q_mix_weights_temperature,
    q_pii_scan,
)
from openslack_crawler_spark.queries_textdedup import h60

SF = "/root/testdata/sf0.001"


def test_stratified_sampling_deterministic_and_narrow(spark):
    a = {r.doc_id for r in q_corpus_sample_stratified(spark, SF).collect()}
    b = {r.doc_id for r in q_corpus_sample_stratified(spark, SF).collect()}
    assert a == b and len(a) > 0
    # pure filter: no Exchange anywhere in the plan (scan-stage predicate)
    plan = q_corpus_sample_stratified(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sampling_rate_is_honored(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    out = q_corpus_sample_stratified(spark, SF)
    stats = {
        (r.source): (r.n, r.rate_ppm)
        for r in out.groupBy("source", "rate_ppm").agg(F.count("*").alias("n")).collect()
    }
    for source, (kept, rate_ppm) in stats.items():
        # hash-threshold sampling keeps ~rate of each stratum; with the
        # small per-source counts allow generous binomial slack
        assert 0 < kept <= totals[source]
        assert 200000 <= rate_ppm <= 800001


def test_mix_weights_sum_and_monotonicity(spark):
    rows = q_mix_weights_temperature(spark, SF).collect()
    total = sum(r.weight_ppm for r in rows)
    # floors lose < 1 ppm per source
    assert 1000000 - len(rows) <= total <= 1000000
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    for lo, hi in zip(by_tokens, by_tokens[1:]):
        assert lo.weight_ppm <= hi.weight_ppm
    # temperature alpha=0.5 up-weights small sources vs proportional
    tok_total = sum(r.n_tokens for r in rows)
    smallest = by_tokens[0]
    assert smallest.weight_ppm >= smallest.n_tokens * 1000000 // tok_total


def test_shard_pack_covers_all_docs_and_respects_budget(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    shards = q_corpus_shard_pack(spark, SF).collect()
    assert sum(r.n_docs for r in shards) == n_docs
    assert all(0 <= r.bucket < SHARD_BUCKETS for r in shards)
    assert all(r.shard_seq >= 0 for r in shards)
    # start-offset packing law: every shard except a bucket's last one
    # is "full" — its docs' start offsets span the whole budget window,
    # so sum_tokens >= budget - (first doc's offset into the window)
    # => any shard with a successor in the same bucket holds >= 1 doc
    # and the bucket's shard_seqs are contiguous from 0
    by_bucket = {}
    for r in shards:
        by_bucket.setdefault(r.bucket, []).append(r.shard_seq)
    for seqs in by_bucket.values():
        seqs.sort()
        assert seqs == list(range(len(seqs)))
    # no shard exceeds budget + the longest doc (greedy overflow bound)
    max_doc = docs.select(
        F.max(F.size(F.split(F.col("text"), " "))).alias("m")
    ).collect()[0].m
    assert all(r.sum_tokens <= SHARD_TOKEN_BUDGET + max_doc for r in shards)


def test_decontaminate_flags_only_corpus_docs_with_bench_overlap(spark):
    out = q_decontaminate_overlap(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark gram set is broadcast
    rows = out.collect()
    for r in rows:
        assert r.n_hits >= 1 and r.n_hits <= r.n_grams
        assert 0 < r.overlap_ppm <= 1000000
    # flagged docs are never benchmark members
    bench_mod = 11
    for r in rows:
        h = spark.range(1).select(
            F.pmod(h60(F.lit(str(r.doc_id))), F.lit(bench_mod)).alias("m")
        ).collect()[0].m
        assert h != 0


def test_pii_scan_counts_and_redaction(spark):
    rows = q_pii_scan(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        if r.doc_id % 5 == 0:
            assert r.n_emails >= 1 and r.n_phones >= 1
            assert r.n_chars_redacted < r.n_chars_raw
        else:
            assert r.n_emails == 0 and r.n_phones == 0
            assert r.n_chars_redacted == r.n_chars_raw


def test_minhash_incremental_probe_matches_self_join_restriction(spark):
    """The incremental probe must find exactly the self-join pairs that
    cross the new/indexed boundary (same bands, same collisions)."""
    from openslack_crawler_spark.queries_textdedup import (
        INCR_NEW_MOD,
        q_minhash_incremental_pairs,
        q_minhash_lsh_pairs,
    )

    inc = {
        (r.new_doc, r.indexed_doc)
        for r in q_minhash_incremental_pairs(spark, SF).collect()
    }
    full = q_minhash_lsh_pairs(spark, SF).collect()
    expected = set()
    for r in full:
        a_new, b_new = r.doc_a % INCR_NEW_MOD == 0, r.doc_b % INCR_NEW_MOD == 0
        if a_new and not b_new:
            expected.add((r.doc_a, r.doc_b))
        elif b_new and not a_new:
            expected.add((r.doc_b, r.doc_a))
    assert inc == expected
    for r in q_minhash_incremental_pairs(spark, SF).collect():
        assert 1 <= r.n_bands_match <= 4
