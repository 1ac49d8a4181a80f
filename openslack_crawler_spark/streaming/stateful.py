"""Custom stateful streaming operator: continuous per-host politeness
pacing with applyInPandasWithState.

The batch engine assigns politeness slots within one round
(operators/politeness.py); in continuous operation the per-host token
bucket must SURVIVE across micro-batches — the streaming twin of the
reference's long-lived per-domain download slots
(/root/reference/crawler/middlewares/crawlera.py:189-211, delay state
lives in the downloader for the whole process lifetime).

State per host: (virtual_clock, served) — the next free fetch slot and
the count served so far. Each micro-batch's requests for a host are
ranked (score desc, enqueue_seq asc) and appended to the host's
timeline starting at the stored clock; the clock persists, so a host
hammered in batch 1 keeps its delay debt in batch 2.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("enqueue_seq", T.LongType()),
        T.StructField("fetch_at", T.DoubleType()),
        T.StructField("served_before", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("clock", T.DoubleType()),
        T.StructField("served", T.LongType()),
    ]
)

DEFAULT_DELAY = 1.0  # settings2.py:14
DEFAULT_CAP = 8  # settings2.py:18


def _pace_host(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    clock, served = state.get if state.exists else (0.0, 0)
    host = key[0]
    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])
        return
    batch = batch.sort_values(
        ["score", "enqueue_seq"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    # token bucket: cap fetches per delay window, clock carries over
    slots = (batch.index // DEFAULT_CAP).to_numpy() * DEFAULT_DELAY + clock
    out = pd.DataFrame(
        {
            "host": host,
            "url": batch["url"],
            "enqueue_seq": batch["enqueue_seq"],
            "fetch_at": slots,
            "served_before": served,
        }
    )
    new_clock = float(slots[-1] + DEFAULT_DELAY)
    state.update((new_clock, served + len(batch)))
    yield out


def paced_fetch_stream(requests: DataFrame) -> DataFrame:
    """requests stream (host, url, score, enqueue_seq) → politeness-paced
    fetch schedule with per-host state persisted across micro-batches."""
    return requests.groupBy("host").applyInPandasWithState(
        _pace_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
