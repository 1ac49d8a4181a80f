"""applyInPandasWithState politeness pacing: per-host token-bucket
state must persist across micro-batches (the delay debt carries)."""

import json

from openslack_crawler_spark.streaming.stateful import paced_fetch_stream


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_pacing_state_survives_batches(spark, tmp_path):
    incoming = tmp_path / "in"
    incoming.mkdir()
    # batch 1: 10 requests for h1 → slots 0.0 (8 fetches) and 1.0 (2)
    _write_batch(
        incoming, "b1.json",
        [{"host": "h1", "url": f"http://h1/{i}", "score": 100.0 - i, "enqueue_seq": i}
         for i in range(10)],
    )
    schema = "host string, url string, score double, enqueue_seq long"
    stream = spark.readStream.schema(schema).json(str(incoming))
    paced = paced_fetch_stream(stream)
    q = (
        paced.writeStream.outputMode("append")
        .format("memory").queryName("paced")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    got1 = {r.url: r for r in spark.sql("select * from paced").collect()}
    assert len(got1) == 10
    assert got1["http://h1/0"].fetch_at == 0.0
    assert got1["http://h1/9"].fetch_at == 1.0  # second token window
    assert all(r.served_before == 0 for r in got1.values())

    # batch 2: h1's clock must resume at 2.0 (1.0 + delay), not 0.0
    _write_batch(
        incoming, "b2.json",
        [{"host": "h1", "url": "http://h1/late", "score": 1.0, "enqueue_seq": 99},
         {"host": "h2", "url": "http://h2/first", "score": 1.0, "enqueue_seq": 100}],
    )
    q.processAllAvailable()
    q.stop()
    got2 = {r.url: r for r in spark.sql("select * from paced").collect()}
    late = got2["http://h1/late"]
    assert late.fetch_at == 2.0  # delay debt carried across batches
    assert late.served_before == 10
    assert got2["http://h2/first"].fetch_at == 0.0  # fresh host, fresh clock
