"""Partitioned cuckoo filter — the deletable alternative to the bloom
prefilter (north_rule: "bloom/cuckoo URL-seen").

Why cuckoo: the reference expires dupefilter fingerprints after 7 days
(/root/reference/crawler/schedulers/redis/dupefilter.py:12). A bloom
cannot delete, so TTL expiry forces a full rebuild; a cuckoo filter
removes the expired fingerprints in place (standard cuckoo-filter
semantics: two candidate buckets per item, relocation on collision,
deletion by fingerprint match).

Layout mirrors the partitioned bloom: blocks sharded by
pmod(url_hash, num_blocks); each block is a numpy uint16 table of
(n_buckets × 4 slots) fingerprints (0 = empty). Build/insert/delete
run vectorized per block inside grouped pandas stages; the probe is
the same cogrouped co-located pass. Like the bloom, the cuckoo is only
ever a PREFILTER — the exact anti-join stays the decider.

Correctness contract (round-1 ADVICE hardening):
- inserts are COUNTING (duplicate fingerprints occupy separate slots),
  so deleting an expired item removes one copy and a live
  fp/bucket-colliding item keeps its own copy — no delete-induced
  false negatives.
- an insert that exhausts MAX_KICKS loses a fingerprint; the block is
  then marked `overflow=true` (sticky) and the probe reports EVERY
  candidate in that block as maybe_seen — degrading that block to the
  exact anti-join instead of risking a false negative.
Net: no false negatives, ever; overflow only costs prefilter
selectivity on the affected block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
MAX_KICKS = 500


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the url_hash."""
    fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """b2 = b1 XOR hash(fp) — the partial-key cuckoo relocation rule."""
    with np.errstate(over="ignore"):
        fh = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        fh ^= fh >> np.uint64(13)
    return ((b.astype(np.uint64) ^ fh) % np.uint64(n_buckets)).astype(np.int64)


class PartitionedCuckoo:
    def __init__(self, num_blocks: int = 32, n_buckets: int = 1 << 16):
        self.num_blocks = num_blocks
        self.n_buckets = n_buckets

    def _block_id(self, col):
        return F.pmod(F.col(col) if isinstance(col, str) else col,
                      F.lit(self.num_blocks)).cast("int")

    # -- per-block kernels (pure numpy, sequential kicks) -------------------
    def _insert_many(
        self, table: np.ndarray, hashes: np.ndarray
    ) -> tuple[np.ndarray, int]:
        """Counting insert: duplicates take separate slots (so delete is
        safe). Returns (table, n_lost) — n_lost > 0 means MAX_KICKS was
        exhausted and a kicked-out fingerprint was dropped; the caller
        must mark the block overflowed."""
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.n_buckets)
        n_lost = 0
        for fp, b1 in zip(fps, b1s):
            b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), self.n_buckets)[0])
            placed = False
            for b in (b1, b2):
                empty = np.where(table[b] == 0)[0]
                if len(empty):
                    table[b, empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # relocate: kick victim (deterministic slot 0)
            b, cur = int(b1), np.uint16(fp)
            for _ in range(MAX_KICKS):
                victim = table[b, 0]
                table[b, 0] = cur
                cur = victim
                b = int(_alt_bucket(np.array([b]), np.array([cur]), self.n_buckets)[0])
                empty = np.where(table[b] == 0)[0]
                if len(empty):
                    table[b, empty[0]] = cur
                    placed = True
                    break
            if not placed:
                # `cur` (some item's fingerprint) was dropped — any item
                # in this block may now be a false negative, so the
                # block degrades to all-maybe via the overflow flag
                n_lost += 1
        return table, n_lost

    def _delete_many(self, table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.n_buckets)
        b2s = _alt_bucket(b1s, fps, self.n_buckets)
        for fp, b1, b2 in zip(fps, b1s, b2s):
            for b in (b1, b2):
                slot = np.where(table[b] == fp)[0]
                if len(slot):
                    table[b, slot[0]] = 0
                    break
        return table

    def _lookup_many(self, table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.n_buckets)
        b2s = _alt_bucket(b1s, fps, self.n_buckets)
        hit1 = (table[b1s] == fps[:, None]).any(axis=1)
        hit2 = (table[b2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    # -- DataFrame surface ----------------------------------------------------
    BLOCK_SCHEMA = "block_id int, table binary, overflow boolean"

    def build(self, seen: DataFrame) -> DataFrame:
        nb, sl = self.n_buckets, SLOTS

        def build_block(pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros((nb, sl), dtype=np.uint16)
            table, n_lost = self._insert_many(
                table, pdf["url_hash"].to_numpy(np.int64)
            )
            return pd.DataFrame(
                {"block_id": [int(pdf["block_id"].iloc[0])],
                 "table": [table.tobytes()],
                 "overflow": [n_lost > 0]}
            )

        return (
            seen.select("url_hash")
            .withColumn("block_id", self._block_id("url_hash"))
            .groupBy("block_id")
            .applyInPandas(build_block, schema=self.BLOCK_SCHEMA)
        )

    def _apply(self, blocks: DataFrame, hashes: DataFrame, op: str) -> DataFrame:
        nb, sl = self.n_buckets, SLOTS
        insert_kernel, delete_kernel = self._insert_many, self._delete_many

        def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if right.empty:
                table = np.zeros((nb, sl), dtype=np.uint16)
                bid = int(left["block_id"].iloc[0])
                overflow = False
            else:
                table = np.frombuffer(
                    right["table"].iloc[0], dtype=np.uint16
                ).reshape(nb, sl).copy()
                bid = int(right["block_id"].iloc[0])
                overflow = bool(right["overflow"].iloc[0])  # sticky
            if not left.empty:
                h = left["url_hash"].to_numpy(np.int64)
                if op == "insert":
                    table, n_lost = insert_kernel(table, h)
                    overflow = overflow or n_lost > 0
                else:
                    table = delete_kernel(table, h)
            return pd.DataFrame(
                {"block_id": [bid], "table": [table.tobytes()],
                 "overflow": [overflow]}
            )

        lc = hashes.select("url_hash").withColumn("block_id", self._block_id("url_hash"))
        return (
            lc.groupBy("block_id")
            .cogroup(blocks.groupBy("block_id"))
            .applyInPandas(run, schema=self.BLOCK_SCHEMA)
        )

    def insert(self, blocks: DataFrame, new: DataFrame) -> DataFrame:
        """Incremental insert; untouched blocks carry over."""
        touched = self._apply(blocks, new, "insert")
        untouched = blocks.join(touched.select("block_id"), "block_id", "left_anti")
        return touched.unionByName(untouched)

    def delete(self, blocks: DataFrame, expired: DataFrame) -> DataFrame:
        """TTL expiry: remove fingerprints in place (the cuckoo win)."""
        touched = self._apply(blocks, expired, "delete")
        untouched = blocks.join(touched.select("block_id"), "block_id", "left_anti")
        return touched.unionByName(untouched)

    def probe(self, cands: DataFrame, blocks: DataFrame) -> DataFrame:
        nb, sl = self.n_buckets, SLOTS
        out_schema = cands.schema.add("maybe_seen", "boolean")
        cols = cands.columns
        lookup = self._lookup_many

        def probe_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return pd.DataFrame(columns=cols + ["maybe_seen"])
            if right.empty:
                maybe = np.zeros(len(left), dtype=bool)
            elif bool(right["overflow"].iloc[0]):
                # a fingerprint was lost in this block — every candidate
                # must go through the exact join (no false negatives)
                maybe = np.ones(len(left), dtype=bool)
            else:
                table = np.frombuffer(
                    right["table"].iloc[0], dtype=np.uint16
                ).reshape(nb, sl)
                maybe = lookup(table, left["url_hash"].to_numpy(np.int64))
            out = left.drop(columns=["block_id"])
            out["maybe_seen"] = maybe
            return out

        lc = cands.withColumn("block_id", self._block_id("url_hash"))
        return (
            lc.groupBy("block_id")
            .cogroup(blocks.groupBy("block_id"))
            .applyInPandas(probe_group, schema=out_schema)
        )
