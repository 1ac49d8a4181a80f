"""Partitioned cuckoo filter: no false negatives, incremental insert,
and DELETION (the TTL-expiry capability a bloom lacks —
dupefilter.py:12's 7-day fingerprint timeout)."""

from pyspark.sql import functions as F

from openslack_crawler_spark.operators.cuckoo import PartitionedCuckoo


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(F.xxhash64("id").alias("url_hash"))


def _cands(df):
    return df.withColumn("enqueue_seq", F.col("url_hash")).withColumn(
        "dont_filter", F.lit(False)
    )


def test_no_false_negatives(spark):
    cf = PartitionedCuckoo(num_blocks=8, n_buckets=1 << 12)
    seen = _hashes(spark, 0, 5000)
    blocks = cf.build(seen)
    probed = cf.probe(_cands(seen), blocks)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_mostly_no_false_positives(spark):
    cf = PartitionedCuckoo(num_blocks=8, n_buckets=1 << 12)
    blocks = cf.build(_hashes(spark, 0, 5000))
    fresh = _cands(_hashes(spark, 100000, 105000))
    fp = cf.probe(fresh, blocks).filter(F.col("maybe_seen")).count()
    assert fp < 5000 * 0.01  # 16-bit fingerprints → ~2^-13 per-bucket fp rate


def test_incremental_insert(spark):
    cf = PartitionedCuckoo(num_blocks=8, n_buckets=1 << 12)
    blocks = cf.build(_hashes(spark, 0, 1000))
    blocks = cf.insert(blocks, _hashes(spark, 1000, 2000))
    probed = cf.probe(_cands(_hashes(spark, 0, 2000)), blocks)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_delete_makes_urls_fresh_again(spark):
    """TTL expiry: deleted fingerprints probe as unseen; undeleted stay."""
    cf = PartitionedCuckoo(num_blocks=8, n_buckets=1 << 12)
    blocks = cf.build(_hashes(spark, 0, 2000))
    expired = _hashes(spark, 0, 1000)
    blocks = cf.delete(blocks, expired)
    probe_expired = cf.probe(_cands(expired), blocks)
    # fp collisions between kept/deleted fingerprints are possible but rare
    assert probe_expired.filter(F.col("maybe_seen")).count() < 1000 * 0.01
    kept = _cands(_hashes(spark, 1000, 2000))
    assert cf.probe(kept, blocks).filter(~F.col("maybe_seen")).count() == 0
