"""IcebergFormat: the TableFormat implementation used when an Iceberg
catalog + runtime jar are on the classpath (real cluster; the sandbox
has neither — SnapshotParquetFormat is the in-sandbox twin with the
same API and commit semantics).

Partition specs applied at table creation (SURVEY.md §4 O2/O12):
- seen:     bucket(N, url_hash)      → storage-partitioned anti-join
- frontier: bucket(M, host_hash)     → dequeue shuffle reuse
- documents: days(fetched_at) if present

north_rule names Iceberg; this module keeps the letter of that on a
cluster while the parquet-snapshot seam keeps the sandbox honest.

API parity with SnapshotParquetFormat is load-bearing: run_round calls
`fmt.commit(updates, appends=..., meta=...)` and run_crawl calls
`fmt.compact(...)` every 16 rounds, so both classes implement the full
seam (tests/test_sources_and_bucketing.py asserts signature parity).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG = "crawler"

PARTITION_SPECS = {
    "seen": "bucket(256, url_hash)",
    "frontier": "bucket(64, host_hash)",
}


class IcebergFormat:
    """Same surface as SnapshotParquetFormat, backed by an Iceberg
    catalog. Multi-table atomicity note: Iceberg commits are per-table;
    cross-table round atomicity is carried by the round metadata table
    (`rounds`) written LAST — a resume reads the highest fully-recorded
    round and ignores newer partial table states (write-ordered commit
    protocol). Each `rounds` row records the Iceberg snapshot id of
    every table at commit time, so `read(table, snapshot_id=k)` is a
    real `VERSION AS OF` time-travel read keyed by the engine's dense
    round-scoped snapshot id (same contract as the parquet twin)."""

    def __init__(self, namespace: str, spark: SparkSession):
        self.ns = f"{CATALOG}.{namespace}"
        self.spark = spark
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")

    def _qualified(self, table: str) -> str:
        return f"{self.ns}.{table}"

    def _ensure(self, table: str, df: DataFrame) -> None:
        spec = PARTITION_SPECS.get(table)
        ddl = df.schema.toDDL()
        part = f" PARTITIONED BY ({spec})" if spec else ""
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._qualified(table)} ({ddl}) USING iceberg{part}"
        )

    def _table_snapshot(self, table: str) -> int | None:
        """Current Iceberg snapshot id of one table (metadata table scan)."""
        try:
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {self._qualified(table)}.snapshots "
                # committed_at is ms-granular: two rapid commits can tie,
                # so break ties on snapshot_id for a deterministic pick
                "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
            ).collect()
            return int(row[0]["snapshot_id"]) if row else None
        except Exception:
            return None

    # -- snapshot plumbing ---------------------------------------------------
    def current_snapshot_id(self) -> int | None:
        try:
            row = self.spark.sql(
                f"SELECT max(sid) AS s FROM {self._qualified('rounds')}"
            ).collect()[0]
            return int(row["s"]) if row["s"] is not None else None
        except Exception:
            return None

    def _manifest(self, snapshot_id: int) -> dict | None:
        try:
            rows = (
                self.spark.table(self._qualified("rounds"))
                .filter(F.col("sid") == snapshot_id)
                .collect()
            )
        except Exception:
            return None
        if not rows:
            return None
        r = rows[0].asDict()
        return {
            "snapshot_id": int(r["sid"]),
            "meta": json.loads(r["meta_json"] or "{}"),
            "table_snapshots": json.loads(r["snaps_json"] or "{}"),
        }

    def current_manifest(self) -> dict | None:
        sid = self.current_snapshot_id()
        return self._manifest(sid) if sid is not None else None

    def meta(self) -> dict:
        m = self.current_manifest()
        return (m or {}).get("meta", {})

    # -- read ------------------------------------------------------------------
    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame | None:
        try:
            if snapshot_id is not None:
                m = self._manifest(snapshot_id)
                if not m or table not in m["table_snapshots"]:
                    return None
                iceberg_sid = m["table_snapshots"][table]
                return self.spark.sql(
                    f"SELECT * FROM {self._qualified(table)} VERSION AS OF {int(iceberg_sid)}"
                )
            df = self.spark.table(self._qualified(table))
            df.schema  # force resolution; missing table → None like the twin
            return df
        except Exception:
            return None

    # -- write -----------------------------------------------------------------
    def commit(
        self,
        updates: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
        appends: dict[str, DataFrame] | None = None,
    ) -> int:
        """Advance the engine snapshot. `updates` replace a table's full
        contents (Iceberg overwrite — a new table snapshot, old data
        retained for time travel); `appends` add data files only
        (O(delta) commit, the Iceberg fast-append shape). The `rounds`
        marker row is written LAST and carries every table's Iceberg
        snapshot id for VERSION AS OF reads."""
        for name, df in (updates or {}).items():
            self._ensure(name, df)
            df.writeTo(self._qualified(name)).overwrite(F.lit(True))
        for name, df in (appends or {}).items():
            self._ensure(name, df)
            df.writeTo(self._qualified(name)).append()
        meta = dict(meta or {})
        cur = self.current_snapshot_id()
        sid = 0 if cur is None else cur + 1
        touched = set((updates or {}).keys()) | set((appends or {}).keys())
        parent = self.current_manifest() or {"table_snapshots": {}}
        snaps = dict(parent["table_snapshots"])
        for name in touched:
            tsid = self._table_snapshot(name)
            if tsid is not None:
                snaps[name] = tsid
        rounds = self.spark.createDataFrame(
            [(int(sid), json.dumps(meta), json.dumps(snaps))],
            "sid int, meta_json string, snaps_json string",
        )
        self._ensure("rounds", rounds)
        rounds.writeTo(self._qualified("rounds")).append()  # commit marker, LAST
        return int(sid)

    def append(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        return self.commit(appends={table: df}, meta=meta)

    def compact(self, table: str) -> int:
        """Iceberg small-file maintenance: rewrite_data_files via the
        system procedure when the catalog exposes it, else a no-op (the
        manifest-list growth the parquet twin compacts away is handled
        by Iceberg metadata natively)."""
        try:
            self.spark.sql(
                f"CALL {CATALOG}.system.rewrite_data_files(table => '{self._qualified(table)}')"
            )
        except Exception:
            pass  # procedure not exposed by this catalog — appends still readable
        return self.current_snapshot_id() or 0

    def merge_upsert(self, table: str, df: DataFrame, key: str) -> int:
        self._ensure(table, df)
        df.createOrReplaceTempView("_merge_src")
        self.spark.sql(
            f"""
            MERGE INTO {self._qualified(table)} t USING _merge_src s
            ON t.{key} = s.{key}
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        return self.current_snapshot_id() or 0

    def merge_upsert_bucketed(
        self, table: str, df: DataFrame, key: str, num_buckets: int = 64
    ) -> int:
        """On Iceberg the engine-level MERGE INTO against a
        bucket(num_buckets, key)-partitioned table already rewrites only
        the data files of affected buckets (copy-on-write scoped by the
        partition spec) — same O(delta buckets) write volume as the
        parquet twin's hand-rolled bucket dirs."""
        spec = PARTITION_SPECS.setdefault(table, f"bucket({num_buckets}, {key})")
        del spec
        return self.merge_upsert(table, df, key)

    def expire_snapshots(self, keep_last: int = 8) -> dict:
        """Iceberg-native snapshot expiry per table + prune the engine's
        rounds marker to the retention window."""
        removed = 0
        try:
            for row in self.spark.sql(f"SHOW TABLES IN {self.ns}").collect():
                t = row["tableName"]
                if t == "rounds":
                    continue
                try:
                    self.spark.sql(
                        f"CALL {CATALOG}.system.expire_snapshots("
                        f"table => '{self.ns}.{t}', retain_last => {int(keep_last)})"
                    )
                    removed += 1
                except Exception:
                    pass
        except Exception:
            pass
        cur = self.current_snapshot_id() or 0
        cutoff = cur - int(keep_last) + 1
        try:
            self.spark.sql(
                f"DELETE FROM {self._qualified('rounds')} WHERE sid < {cutoff} AND sid != {cur}"
            )
        except Exception:
            pass
        return {"expired_tables": removed, "kept_last": int(keep_last)}

    def destroy(self) -> None:
        try:
            for row in self.spark.sql(f"SHOW TABLES IN {self.ns}").collect():
                self.spark.sql(f"DROP TABLE IF EXISTS {self.ns}.{row['tableName']}")
            self.spark.sql(f"DROP NAMESPACE IF EXISTS {self.ns}")
        except Exception:
            pass
