"""Randomized threaded stress over the FULL DML surface — upsert,
append-only INSERT, MERGE (update/delete clauses), DELETE WHERE and
UPDATE WHERE in both merge-on-read and copy-on-write modes, plus
concurrent CLONE — against BOTH commit backends (POSIX exclusive-link
and the object-store conditional-PUT twin), finished by a RESTORE
check.

Soundness model: each writer thread owns a disjoint key range (its own
partition), applies a random op sequence to its keys, and folds the
same sequence into a local dict model. Any serialization of
key-disjoint ops equals the union of the per-thread folds, so a lost
update, a resurrected delete, or a torn commit shows up as divergence.
Cross-partition interference is exactly what the probe-based CoW ops
must NOT have — their match scans see the whole table while other
threads commit into it (merge never fast-forwards; the retry loop
re-merges against the winner's head).
"""

from __future__ import annotations

import random
import shutil
import tempfile
import threading
import uuid

import pytest

from data_management_service_run_etl_imputations_spark.sources.fsck import (
    manifest_fsck,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    ConditionalPutCommitBackend,
    manifest_clone,
    manifest_delete_where,
    manifest_history,
    manifest_insert,
    manifest_merge,
    manifest_read,
    manifest_restore,
    manifest_update_where,
    manifest_upsert_partitioned,
    set_commit_backend,
    with_commit_retry,
)


# r13 driver-window tier: this file is in the SLOW families (measured
# from the full-suite durations log); deselect with -m "not slow".
pytestmark = pytest.mark.slow


@pytest.fixture()
def stress_root():
    root = f"{tempfile.gettempdir()}/dmlstress_{uuid.uuid4().hex[:10]}"
    yield root
    shutil.rmtree(root, ignore_errors=True)
    for i in range(8):
        shutil.rmtree(f"{root}_clone{i}", ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")


N_THREADS = 3
KEYS_PER_THREAD = 6
OPS_PER_THREAD = 5


def _writer(spark, path, t, seed, model, errors):
    """Random op sequence over thread t's own keys, folded into model."""
    rng = random.Random(seed)
    lo = t * 100
    keys = list(range(lo, lo + KEYS_PER_THREAD))
    day = f"d{t}"
    # seed the thread's partition
    rows = [(k, day, float(k)) for k in keys]
    with_commit_retry(
        lambda: manifest_upsert_partitioned(
            _df(spark, rows), path, ["k"], "day"
        ),
        max_attempts=20,
    )
    for k, d, v in rows:
        model[k] = (k, d, v)
    try:
        for step in range(OPS_PER_THREAD):
            op = rng.choice(
                ["upsert", "merge_up", "merge_del", "del_mor", "del_cow",
                 "upd_mor", "upd_cow", "insert"]
            )
            some = sorted(rng.sample(keys, 2))
            if op == "insert":
                # append-only engine racing the other threads' commits;
                # fresh keys per step keep the dict model sound (insert
                # never merges — a duplicate key would be two rows)
                batch = [
                    (lo + 30 + 2 * step, day, float(3000 * t + step)),
                    (lo + 31 + 2 * step, day, float(3000 * t + step)),
                ]
                with_commit_retry(
                    lambda b=batch: manifest_insert(_df(spark, b), path),
                    max_attempts=20,
                )
                for k, d, v in batch:
                    model[k] = (k, d, v)
                continue
            if op == "upsert":
                val = float(1000 * t + step)
                batch = [(k, day, val) for k in some]
                with_commit_retry(
                    lambda b=batch: manifest_upsert_partitioned(
                        _df(spark, b), path, ["k"], "day"
                    ),
                    max_attempts=20,
                )
                for k, d, v in batch:
                    model[k] = (k, d, v)
            elif op == "merge_up":
                val = float(2000 * t + step)
                batch = [(k, day, val) for k in some]
                with_commit_retry(
                    lambda b=batch: manifest_merge(
                        _df(spark, b), path, ["k"], "day",
                        matched_update={"v": "s.v"},
                        insert_not_matched=True,
                    ),
                    max_attempts=20,
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
                    max_attempts=20,
                )
                for k, _, _ in batch:
                    model.pop(k, None)
            elif op in ("del_mor", "del_cow"):
                k = some[0]
                with_commit_retry(
                    lambda k=k: manifest_delete_where(
                        spark, path, f"k = {k}",
                        mode="mor" if op == "del_mor" else "cow",
                    ),
                    max_attempts=20,
                )
                model.pop(k, None)
            else:  # upd_mor / upd_cow
                k = some[1]
                delta = float(10 * step + 1)
                with_commit_retry(
                    lambda k=k, d=delta: manifest_update_where(
                        spark, path, {"v": f"v + {d}"}, f"k = {k}",
                        mode="mor" if op == "upd_mor" else "cow",
                    ),
                    max_attempts=20,
                )
                if k in model:
                    kk, dd, vv = model[k]
                    model[k] = (kk, dd, vv + delta)
    except Exception as e:  # pragma: no cover — failure is the assert
        errors.append((t, op, e))


def _run_stress(spark, root, seed):
    models = [dict() for _ in range(N_THREADS)]
    errors: list = []
    threads = [
        threading.Thread(
            target=_writer,
            args=(spark, root, t, seed + t, models[t], errors),
        )
        for t in range(N_THREADS)
    ]
    clones: list[tuple[str, int]] = []

    def cloner():
        # concurrent zero-copy clones: each must be a CONSISTENT
        # snapshot of some committed version, fsck-clean
        import time

        deadline = time.time() + 120
        while len(manifest_history(root)) < 2 and time.time() < deadline:
            time.sleep(0.2)  # wait for the table to exist
        for i in range(3):
            dst = f"{root}_clone{i}"
            try:
                manifest_clone(root, dst)
                src_v = manifest_history(dst)[-1]["op_metrics"][
                    "source_version"
                ]
                clones.append((dst, src_v))
            except Exception as e:  # pragma: no cover
                errors.append(("clone", i, e))

    # stagger: start writers, clone midway through
    for th in threads[:2]:
        th.start()
    cth = threading.Thread(target=cloner)
    cth.start()
    for th in threads[2:]:
        th.start()
    for th in [*threads, cth]:
        th.join(timeout=600)
    assert errors == [], errors[:3]
    return models, clones


def _table_rows(spark, path, **kw):
    return sorted(
        (r["k"], r["day"], r["v"])
        for r in manifest_read(spark, path, **kw).collect()
    )


def _check(spark, root, models, clones):
    want = sorted(v for m in models for v in m.values())
    assert _table_rows(spark, root) == want
    assert manifest_fsck(root)["errors"] == []
    for dst, src_v in clones:
        assert _table_rows(spark, dst) == _table_rows(
            spark, root, version=src_v
        )
        assert manifest_fsck(dst)["errors"] == []
    # RESTORE to a mid-run version: head must equal that version's read
    hist = manifest_history(root)
    mid_v = hist[len(hist) // 2]["version"]
    mid_rows = _table_rows(spark, root, version=mid_v)
    manifest_restore(root, version=mid_v)
    assert _table_rows(spark, root) == mid_rows
    assert manifest_fsck(root)["errors"] == []


def test_full_dml_surface_stress_posix_backend(spark, stress_root):
    models, clones = _run_stress(spark, stress_root, seed=801)
    _check(spark, stress_root, models, clones)


def test_full_dml_surface_stress_conditional_put_backend(
    spark, stress_root
):
    prev = set_commit_backend(ConditionalPutCommitBackend())
    try:
        models, clones = _run_stress(spark, stress_root, seed=802)
        _check(spark, stress_root, models, clones)
    finally:
        set_commit_backend(prev)
