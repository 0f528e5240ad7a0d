"""VACUUM vs lagging streaming reader (VERDICT r9 "Next round" #4): a
stream whose checkpointed offset fell behind VACUUM's retention floor
must fail LOUDLY on restart — never skip the vacuumed commits silently.
Proven on both commit backends (posix-link and conditional-put) and in
both feed modes (append and cdf).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
    ManifestFeedDataSource,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    ConditionalPutCommitBackend,
    PosixLinkCommitBackend,
    manifest_upsert_partitioned,
    manifest_vacuum,
    set_commit_backend,
)


@pytest.fixture()
def table_path():
    path = f"{tempfile.gettempdir()}/vguard_{uuid.uuid4().hex[:12]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}_ckpt", ignore_errors=True)
    shutil.rmtree(f"{path}_out", ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


def _run_stream(spark, table_path, mode="append"):
    spark.dataSource.register(ManifestFeedDataSource)
    reader = (
        spark.readStream.format("manifest_feed")
        .option("path", table_path)
    )
    if mode == "cdf":
        reader = reader.option("mode", "cdf")
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", f"{table_path}_out")
        .option("checkpointLocation", f"{table_path}_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


@pytest.mark.parametrize(
    "backend", [PosixLinkCommitBackend, ConditionalPutCommitBackend]
)
@pytest.mark.parametrize("mode", ["append", "cdf"])
def test_vacuumed_offset_fails_loudly_on_restart(
    spark, table_path, backend, mode
):
    prev = set_commit_backend(backend())
    try:
        # v1: initial load; stream processes it and checkpoints offset 1
        manifest_upsert_partitioned(
            _batch(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
        )
        _run_stream(spark, table_path, mode)

        # the table moves on while the stream is down — enough commits
        # that keep_versions=1 pulls the retention floor past offset 1
        for i in range(2, 8):
            manifest_upsert_partitioned(
                _batch(spark, [(i, f"d{i}", float(i))]),
                table_path,
                ["k"],
                "day",
            )
        manifest_vacuum(table_path, keep_versions=1)
        from data_management_service_run_etl_imputations_spark.sources.sinks import (
            _oldest_version,
        )

        assert _oldest_version(table_path) > 2  # floor truly moved

        # restart from the stale checkpoint: loud, attributed failure
        with pytest.raises(StreamingQueryException) as exc:
            _run_stream(spark, table_path, mode)
        msg = str(exc.value)
        assert "VACUUM" in msg and "FRESH checkpoint" in msg
    finally:
        set_commit_backend(prev)


def test_restart_within_retention_still_works(spark, table_path):
    """The guard must not fire when retention covers the lag: vacuum
    with a keep window that includes the checkpointed offset, restart,
    and the stream resumes exactly-once."""
    manifest_upsert_partitioned(
        _batch(spark, [(1, "d1", 1.0)]), table_path, ["k"], "day"
    )
    _run_stream(spark, table_path)
    manifest_upsert_partitioned(
        _batch(spark, [(2, "d2", 2.0)]), table_path, ["k"], "day"
    )
    manifest_vacuum(table_path, keep_versions=10)  # keeps everything
    _run_stream(spark, table_path)
    got = sorted(
        (r["k"], r["_commit_version"])
        for r in spark.read.parquet(f"{table_path}_out").collect()
    )
    assert got == [(1, 1), (2, 2)]
