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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    protocol)."""

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

    def current_snapshot_id(self) -> int | None:
        try:
            row = self.spark.sql(
                f"SELECT max(round) AS r FROM {self._qualified('rounds')}"
            ).collect()[0]
            return row["r"]
        except Exception:
            return None

    def meta(self) -> dict:
        sid = self.current_snapshot_id()
        if sid is None:
            return {}
        row = (
            self.spark.table(self._qualified("rounds"))
            .filter(f"round = {sid}")
            .collect()[0]
        )
        return row.asDict()

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame | None:
        try:
            if snapshot_id is not None:
                return (
                    self.spark.read.option("snapshot-id", snapshot_id)
                    .format("iceberg")
                    .load(self._qualified(table))
                )
            return self.spark.table(self._qualified(table))
        except Exception:
            return None

    def commit(self, updates: dict[str, DataFrame], meta: dict | None = None) -> int:
        for name, df in updates.items():
            self._ensure(name, df)
            df.writeTo(self._qualified(name)).overwritePartitions()
        meta = dict(meta or {})
        rounds = self.spark.createDataFrame(
            [(int(meta.get("round", 0)), int(meta.get("next_seq", 0)))],
            "round int, next_seq long",
        )
        self._ensure("rounds", rounds)
        rounds.writeTo(self._qualified("rounds")).append()  # commit marker, LAST
        return int(meta.get("round", 0))

    def append(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        self._ensure(table, df)
        df.writeTo(self._qualified(table)).append()
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
