"""CONTINUOUS CDC under concurrent upstream DML (VERDICT r8 "Next
round" #6): writer threads race randomized upsert / MERGE-delete /
copy-on-write DELETE / merge-on-read UPDATE commits into their own
partitions of an upstream manifest table WHILE the CDF stream
repeatedly drains into a downstream table through
``manifest_apply_cdf_batch`` (restarting from its checkpoint between
drains — every drain is a restart-resume under race). Soundness model
as tests/test_dml_concurrency_stress.py: key-disjoint writers fold
their own op sequences into local models, so any serialization equals
the union of folds; the downstream table must equal the upstream
snapshot AND the model union at quiescence, on BOTH commit backends.
"""

from __future__ import annotations

import random
import shutil
import tempfile
import threading
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.manifest_stream import (
    ManifestFeedDataSource,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    ConditionalPutCommitBackend,
    manifest_delete_where,
    manifest_apply_cdf_batch,
    manifest_merge,
    manifest_read,
    manifest_update_where,
    manifest_upsert_partitioned,
    set_commit_backend,
    with_commit_retry,
)

N_THREADS = 3
KEYS_PER_THREAD = 6
OPS_PER_THREAD = 4


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def roots():
    base = f"{tempfile.gettempdir()}/cdfstress_{uuid.uuid4().hex[:10]}"
    up, down, ckpt = f"{base}_up", f"{base}_down", f"{base}_ckpt"
    yield up, down, ckpt
    for p in (up, down, ckpt):
        shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


def _writer(spark, path, t, seed, model, errors):
    rng = random.Random(seed)
    keys = list(range(t * 100, t * 100 + KEYS_PER_THREAD))
    day = f"d{t}"
    rows = [(k, day, float(k)) for k in keys]
    try:
        with_commit_retry(
            lambda: manifest_upsert_partitioned(
                _df(spark, rows), path, ["k"], "day"
            ),
            max_attempts=30,
        )
        for k, d, v in rows:
            model[k] = (k, d, v)
        for step in range(OPS_PER_THREAD):
            op = rng.choice(["upsert", "merge_del", "del_cow", "upd_mor"])
            some = sorted(rng.sample(keys, 2))
            if op == "upsert":
                val = float(1000 * t + step)
                batch = [(k, day, val) for k in some]
                with_commit_retry(
                    lambda b=batch: manifest_upsert_partitioned(
                        _df(spark, b), path, ["k"], "day"
                    ),
                    max_attempts=30,
                )
                for k, d, v in batch:
                    model[k] = (k, d, v)
            elif op == "merge_del":
                batch = [(k, day, 0.0) for k in some]
                with_commit_retry(
                    lambda b=batch: manifest_merge(
                        _df(spark, b), path, ["k"], "day",
                        matched_delete="true",
                        insert_not_matched=False,
                    ),
                    max_attempts=30,
                )
                for k, _, _ in batch:
                    model.pop(k, None)
            elif op == "del_cow":
                cond = f"k IN ({some[0]}, {some[1]}) AND day = '{day}'"
                with_commit_retry(
                    lambda c=cond: manifest_delete_where(
                        spark, path, c, mode="cow"
                    ),
                    max_attempts=30,
                )
                for k in some:
                    model.pop(k, None)
            else:  # upd_mor
                val = float(3000 * t + step)
                cond = f"k IN ({some[0]}, {some[1]}) AND day = '{day}'"
                with_commit_retry(
                    lambda c=cond, x=val: manifest_update_where(
                        spark, path, {"v": str(x)}, c, mode="mor"
                    ),
                    max_attempts=30,
                )
                for k in some:
                    if k in model:
                        model[k] = (k, day, val)
    except Exception as e:  # pragma: no cover — surfaced by assertion
        errors.append((t, step if "step" in dir() else -1, repr(e)))


def _drain(spark, up, down, ckpt, app):
    """One restart-resume drain: start the CDF stream from its
    checkpoint, catch up to the current head, stop."""
    spark.dataSource.register(ManifestFeedDataSource)
    feed = (
        spark.readStream.format("manifest_feed")
        .option("path", up)
        .option("mode", "cdf")
        .load()
    )
    q = (
        feed.writeStream.foreachBatch(
            lambda bdf, bid: manifest_apply_cdf_batch(
                bdf, down, ["k"], "day", app, bid
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _snap(spark, path):
    try:
        return sorted(
            (r["k"], r["day"], r["v"])
            for r in manifest_read(spark, path).collect()
        )
    except ValueError:
        return []


def _run(spark, roots, seed):
    up, down, ckpt = roots
    app = f"cdfs_{uuid.uuid4().hex[:6]}"
    models = [dict() for _ in range(N_THREADS)]
    errors: list = []
    threads = [
        threading.Thread(
            target=_writer,
            args=(spark, up, t, seed + t, models[t], errors),
        )
        for t in range(N_THREADS)
    ]
    for th in threads:
        th.start()
    # the stream needs an existing upstream table (same wait the DML
    # stress's cloner performs before its first clone)
    import time as _time

    from data_management_service_run_etl_imputations_spark.sources.sinks import (
        _latest_version,
    )

    deadline = _time.time() + 120
    while _latest_version(up) < 1 and _time.time() < deadline:
        _time.sleep(0.2)
    # the CDC participant: drain repeatedly WHILE commits land — each
    # pass restarts from the checkpoint mid-race
    drains = 0
    while any(th.is_alive() for th in threads):
        try:
            _drain(spark, up, down, ckpt, app)
            drains += 1
        except Exception as e:  # pragma: no cover
            errors.append(("drain", drains, repr(e)))
            break
    for th in threads:
        th.join(timeout=600)
    assert errors == [], errors[:3]
    _drain(spark, up, down, ckpt, app)  # final catch-up at quiescence
    assert drains >= 1
    want = sorted(v for m in models for v in m.values())
    up_snap = _snap(spark, up)
    down_snap = _snap(spark, down)
    assert up_snap == want, "upstream diverged from the op-fold model"
    assert down_snap == up_snap, (
        "downstream CDC apply diverged from the upstream snapshot"
    )


def test_cdf_apply_races_dml_posix_backend(spark, roots):
    _run(spark, roots, seed=901)


def test_cdf_apply_races_dml_conditional_put_backend(spark, roots):
    prev = set_commit_backend(ConditionalPutCommitBackend())
    try:
        _run(spark, roots, seed=902)
    finally:
        set_commit_backend(prev)
