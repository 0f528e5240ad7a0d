"""Structured-Streaming SOURCE over the manifest table's commit log
(Spark 4 Python streaming DataSource API) — the ``readStream`` half of
the table protocol, mirroring Delta's streaming source design.

Offsets ARE manifest versions: the stream's offset ``{"version": N}``
means "every file added by commits ≤ N has been emitted". Each
micro-batch reads exactly the parquet files ADDED between the start and
end versions (computed driver-side from the immutable commit log — zero
filesystem listing), one InputPartition per file, Arrow record batches
straight from the parquet footer on executors. Because manifests and
data files are immutable, replaying an offset range after a crash
re-reads byte-identical data — offsets checkpoint like any built-in
source and the feed is exactly-once end-to-end.

Semantics (the same contract Delta's streaming source ships with):

- **Append-driven.** A commit's contribution is the files it ADDED.
  File-granular copy-on-write keeps this tight: an upsert/merge re-adds
  only the files it actually REWROTE (those holding matched keys), so
  survivor rows re-emit only from genuinely rewritten files (Delta's
  ``ignoreChanges`` caveat, scoped and documented rather than hidden);
  insert-only workloads — the reference's S7 semantics
  (``function_app.py:305-312``) — emit each row exactly once, even
  into partitions that already hold other keys' files. Row-level
  deletes do not emit (use ``manifest_diff`` for a full delete-aware
  change feed in batch).
- **Schema.** The stream schema is the table schema at query start plus
  ``_commit_version long``; files written before a column was added
  emit NULL for it (schema-group alignment, same as batch reads).
- **Vacuum interplay.** Vacuuming a version whose files the stream has
  not yet processed fails the query loudly (missing file), never
  silently skips — retain at least the streaming lag
  (``manifest_vacuum(retain_seconds=...)``).

Usage::

    spark.dataSource.register(ManifestFeedDataSource)
    stream = (spark.readStream.format("manifest_feed")
              .option("path", table_root)
              .option("start_version", 0)   # 0 = backfill (default)
              .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

VERSION_COL = "_commit_version"


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, version: int, arrow_schema_bytes: bytes):
        self.file_path = file_path
        self.version = version
        self.arrow_schema_bytes = arrow_schema_bytes


def _added_files(path: str, version: int) -> list[str]:
    """File rels ADDED by ``version``: its live file list minus the
    previous version's. Pure metadata — two materialized manifests."""
    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _live_file_rels,
        _materialize,
    )

    now = set(_live_file_rels(_materialize(path, version)))
    if version <= 1:
        return sorted(now)
    prev = set(_live_file_rels(_materialize(path, version - 1)))
    return sorted(now - prev)


class ManifestFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_feed requires .option('path', ...)")
        self.start_version = int(options.get("start_version", 0))
        # arrow schema for executor-side alignment, shipped per partition
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        fields = [
            pa.field(f.name, to_arrow_type(f.dataType))
            for f in schema.fields
            if f.name != VERSION_COL
        ]
        self._arrow_schema_bytes = pa.schema(fields).serialize().to_pybytes()

    def initialOffset(self) -> dict:
        return {"version": max(0, self.start_version - 1)}

    def latestOffset(self) -> dict:
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _latest_manifest,
        )

        v, _ = _latest_manifest(self.path)
        return {"version": max(v, self.initialOffset()["version"])}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            for frel in _added_files(self.path, v):
                parts.append(
                    _FilePartition(
                        f"{self.path}/{frel}", v, self._arrow_schema_bytes
                    )
                )
        # Spark requires >=1 partition per planned batch; an empty range
        # (e.g. a metadata-only commit) contributes an empty partition
        if not parts:
            parts.append(_FilePartition("", -1, self._arrow_schema_bytes))
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = pa.ipc.read_schema(
            pa.BufferReader(partition.arrow_schema_bytes)
        )
        if not partition.file_path:
            return iter(())
        t = pq.read_table(partition.file_path)
        n = len(t)
        cols = []
        for field in target:
            if field.name in t.column_names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(n, field.type))  # pre-evolution file
        cols.append(pa.array([partition.version] * n, pa.int64()))
        out = pa.table(
            cols, schema=target.append(pa.field(VERSION_COL, pa.int64()))
        )
        return iter(out.to_batches())

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's checkpoint; manifests are immutable

    def stop(self) -> None:
        pass


class ManifestFeedDataSource(DataSource):
    """``manifest_feed`` format: exactly-once streaming reads of the
    files each manifest commit added."""

    @classmethod
    def name(cls) -> str:
        return "manifest_feed"

    def schema(self):
        import json

        from pyspark.sql.types import LongType, StructField, StructType

        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _latest_manifest,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_feed requires .option('path', ...)")
        version, content = _latest_manifest(path)
        if version == 0 or not content.get("schema_json"):
            raise ValueError(
                f"no manifest table (with schema_json) at {path}"
            )
        # fromJson is pure Python — this method runs in a session-less
        # data-source worker where Spark's DDL parser is unavailable
        base = StructType.fromJson(json.loads(content["schema_json"]))
        return StructType(
            [*base.fields, StructField(VERSION_COL, LongType(), False)]
        )

    def streamReader(self, schema):
        return ManifestFeedStreamReader(schema, self.options)
