"""Dedicated message-queue item sinks: RabbitMQ (S13) and Flume (S17).

Reference behavior being re-expressed:
- RabbitMQPipeline (/root/reference/crawler/pipelines/rabbitmq.py:24-36):
  each item is JSON-encoded and published to routing_key
  "<spider>:items" on the default exchange.
- FlumePipeline (/root/reference/crawler/pipelines/flume.py:46-77):
  items become ThriftFlumeEvent(headers: map<str,str>, body) records
  sent in batches over a framed compact-protocol transport.

Spark-first split: the SINK PLAN (item rows → wire-shaped rows) is a
pure DataFrame projection, identical no matter which transport carries
it; the TRANSPORT is a per-partition writer gated on the client lib
being importable (pika / thrift — absent in-sandbox, like the kafka
connector jar). Without a transport the same plan spools to a
directory of parquet part-files, one file per partition — the
connector-free twin, same policy as build_request_source
(../streaming/ingest.py).
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# -- capability gates ---------------------------------------------------------
def rabbitmq_available() -> bool:
    """True when the pika client lib is importable (the transport the
    reference's connection.from_settings wraps)."""
    return importlib.util.find_spec("pika") is not None


def flume_available() -> bool:
    """True when the thrift lib is importable (FlumeClient's framed
    TCompactProtocol transport)."""
    return importlib.util.find_spec("thrift") is not None


def choose_item_sink(kind: str, endpoint: str | None, spool_dir: str | None) -> str:
    """Sink-selection policy, unit-testable without the client libs:
    the real transport when requested AND importable, else the spool
    twin. Mirrors choose_request_source."""
    available = {"rabbitmq": rabbitmq_available, "flume": flume_available}
    if kind not in available:
        raise ValueError(f"unknown sink kind {kind!r}")
    if endpoint and available[kind]():
        return kind
    if spool_dir:
        return "spool"
    if endpoint:
        raise RuntimeError(
            f"{kind} endpoint given but the client lib is not importable, "
            "and no spool_dir fallback was provided"
        )
    raise ValueError("need endpoint and/or spool_dir")


# -- sink plans (pure DataFrame projections) ----------------------------------
def rabbitmq_sink_plan(items: DataFrame, spider: str = "link") -> DataFrame:
    """Item rows → (routing_key, body): routing_key is the reference's
    '<spider>:items' (rabbitmq.py:34-36), body the JSON-encoded item.
    to_json runs JVM-side; no Python in the projection."""
    return items.select(
        F.lit(f"{spider}:items").alias("routing_key"),
        F.to_json(F.struct(*[F.col(c) for c in items.columns])).alias("body"),
    )


def flume_sink_plan(
    items: DataFrame, header_cols: tuple[str, ...] = ("appid", "crawlid")
) -> DataFrame:
    """Item rows → ThriftFlumeEvent shape (headers map<string,string>,
    body string): routing metadata rides in headers (the event-header
    contract flume.py:77 shows), the full item JSON in the body."""
    present = [c for c in header_cols if c in items.columns]
    headers = F.map_from_arrays(
        F.array(*[F.lit(c) for c in present]),
        F.array(*[F.col(c).cast("string") for c in present]),
    )
    return items.select(
        headers.alias("headers"),
        F.to_json(F.struct(*[F.col(c) for c in items.columns])).alias("body"),
    )


# -- transports ---------------------------------------------------------------
def write_rabbitmq(
    items: DataFrame,
    spider: str = "link",
    endpoint: str | None = None,
    spool_dir: str | None = None,
) -> str:
    """Publish the rabbitmq sink plan. Real transport: one pika
    connection per partition, basic_publish per row (the distributed
    form of the reference's single-threaded publish loop). Spool twin:
    the identical rows as parquet."""
    chosen = choose_item_sink("rabbitmq", endpoint, spool_dir)
    plan = rabbitmq_sink_plan(items, spider=spider)
    if chosen == "rabbitmq":

        def publish(rows):
            import pika  # noqa: PLC0415

            conn = pika.BlockingConnection(pika.URLParameters(endpoint))
            ch = conn.channel()
            for r in rows:
                ch.basic_publish(
                    exchange="", routing_key=r["routing_key"], body=r["body"]
                )
            conn.close()

        plan.foreachPartition(publish)
    else:
        plan.write.mode("append").parquet(spool_dir)
    return chosen


def write_flume(
    items: DataFrame,
    endpoint: str | None = None,
    spool_dir: str | None = None,
    batch_size: int = 100,
) -> str:
    """Send the flume sink plan. Real transport: one framed
    compact-protocol client per partition, appendBatch in batch_size
    chunks (flume.py:66-71). Spool twin: identical event rows as
    parquet."""
    chosen = choose_item_sink("flume", endpoint, spool_dir)
    plan = flume_sink_plan(items)
    if chosen == "flume":
        host, _, port = endpoint.rpartition(":")

        def send(rows):
            # the thrift-generated Flume source client; import-gated
            from flume_thrift_client import FlumeClient, make_event  # noqa: PLC0415

            client = FlumeClient(host, int(port))
            batch: list = []
            for r in rows:
                batch.append(make_event(dict(r["headers"]), r["body"]))
                if len(batch) >= batch_size:
                    client.send_batch(batch)
                    batch = []
            if batch:
                client.send_batch(batch)
            client.close()

        plan.foreachPartition(send)
    else:
        plan.write.mode("append").parquet(spool_dir)
    return chosen
