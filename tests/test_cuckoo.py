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


def test_delete_keeps_colliding_live_item(spark):
    """Counting-slot semantics: two distinct hashes sharing (fingerprint,
    bucket) are stored as two copies; deleting one must NOT make the
    other probe unseen (round-1 ADVICE: idempotent inserts + delete gave
    false negatives)."""
    cf = PartitionedCuckoo(num_blocks=8, n_buckets=1 << 12)
    # same residue mod n_buckets and same top-16 bits (fp both → 1):
    h1, h2 = 12345, 12345 + (1 << 12)
    pair = spark.createDataFrame([(h1,), (h2,)], "url_hash long")
    blocks = cf.build(pair)
    blocks = cf.delete(blocks, spark.createDataFrame([(h1,)], "url_hash long"))
    live = _cands(spark.createDataFrame([(h2,)], "url_hash long"))
    assert cf.probe(live, blocks).filter(~F.col("maybe_seen")).count() == 0


def test_overflow_block_degrades_to_all_maybe(spark):
    """Insert overflow (MAX_KICKS exhausted) loses a fingerprint; the
    block must flag overflow and probe everything as maybe_seen so the
    exact anti-join decides — never a false negative."""
    cf = PartitionedCuckoo(num_blocks=1, n_buckets=4)  # 16-slot capacity
    blocks = cf.build(_hashes(spark, 0, 500))
    assert blocks.filter(F.col("overflow")).count() == 1
    # seen hashes: all maybe (trivially no false negatives)
    seen_probe = cf.probe(_cands(_hashes(spark, 0, 500)), blocks)
    assert seen_probe.filter(~F.col("maybe_seen")).count() == 0
    # even fresh hashes are maybe in an overflowed block (degrade safely)
    fresh_probe = cf.probe(_cands(_hashes(spark, 9000, 9100)), blocks)
    assert fresh_probe.filter(~F.col("maybe_seen")).count() == 0


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
