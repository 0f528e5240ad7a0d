"""SCD2 tests: rebuild semantics (collapse, expire, current flags) and the
fold-equivalence of the incremental batch merge with the full-history
rebuild — the property that makes per-run merges safe."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.scd import (
    scd2_apply_batch,
    scd2_from_history,
)

SCHEMA = "k LONG, ts TIMESTAMP, attr STRING"


def _ts(day: int) -> datetime:
    return datetime(2024, 1, day)

# key 1: A, restated A (collapses), B, A again (real new version)
# key 2: single version
# key 3: appears only in a later batch
HISTORY = [
    (1, _ts(1), "A"),
    (1, _ts(2), "A"),
    (1, _ts(3), "B"),
    (1, _ts(5), "A"),
    (2, _ts(2), "X"),
    (3, _ts(6), "Z"),
]


def _rows(df):
    return {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_scd2_rebuild_semantics(spark):
    changes = spark.createDataFrame(HISTORY, SCHEMA)
    out = scd2_from_history(changes, ["k"], "ts", ["attr"])
    assert _rows(out) == {
        (1, "A", _ts(1), _ts(3), False),
        (1, "B", _ts(3), _ts(5), False),
        (1, "A", _ts(5), None, True),
        (2, "X", _ts(2), None, True),
        (3, "Z", _ts(6), None, True),
    }


def test_scd2_batch_fold_equals_rebuild(spark):
    """Applying the change log in day-sized batches must produce exactly
    the full-rebuild state — including the tricky leading-restatement and
    restate-then-change-within-one-batch cases."""
    changes = spark.createDataFrame(HISTORY, SCHEMA)
    full = scd2_from_history(changes, ["k"], "ts", ["attr"])

    empty = spark.createDataFrame([], SCHEMA).select(
        "k", "attr",
        F.col("ts").alias("valid_from"),
        F.col("ts").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    state = empty
    for days in [(1, 2), (3,), (4, 5, 6)]:
        batch = spark.createDataFrame(
            [r for r in HISTORY if r[1].day in days] or [], SCHEMA
        )
        if batch.isEmpty():
            continue
        state = scd2_apply_batch(
            state, batch, ["k"], "ts", ["attr"]
        ).localCheckpoint()
    assert _rows(state) == _rows(full)


def test_scd2_out_of_order_batch_rebuild_equals_full(spark):
    """Late-arriving batch (rows at/before the key's current valid_from)
    under the default rebuild policy must equal a full rebuild over the
    combined log — and never leave two is_current rows per key (the
    round-2 ADVICE bug: insert-without-expiry)."""
    base = spark.createDataFrame(
        [(1, _ts(5), "C"), (2, _ts(2), "X")], SCHEMA
    )
    state = scd2_from_history(base, ["k"], "ts", ["attr"])
    # key 1 gets a LATE row (day 3 < current valid_from day 5) plus an
    # in-order one (day 8); key 2 stays in-order.
    batch = spark.createDataFrame(
        [(1, _ts(3), "B"), (1, _ts(8), "D"), (2, _ts(9), "Y")], SCHEMA
    )
    out = scd2_apply_batch(state, batch, ["k"], "ts", ["attr"])
    combined = spark.createDataFrame(
        [(1, _ts(5), "C"), (2, _ts(2), "X"),
         (1, _ts(3), "B"), (1, _ts(8), "D"), (2, _ts(9), "Y")],
        SCHEMA,
    )
    assert _rows(out) == _rows(scd2_from_history(combined, ["k"], "ts", ["attr"]))
    current_per_key = (
        out.filter("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in current_per_key)


def test_scd2_out_of_order_batch_drop_and_error(spark):
    import pytest

    base = spark.createDataFrame([(1, _ts(5), "C")], SCHEMA)
    state = scd2_from_history(base, ["k"], "ts", ["attr"])
    late = spark.createDataFrame([(1, _ts(3), "B")], SCHEMA)
    dropped = scd2_apply_batch(
        state, late, ["k"], "ts", ["attr"], on_out_of_order="drop"
    )
    assert _rows(dropped) == _rows(state)
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_apply_batch(
            state, late, ["k"], "ts", ["attr"], on_out_of_order="error"
        )


def test_scd2_batch_restatement_then_change_single_batch(spark):
    """One batch whose first row restates current attrs and whose second
    differs: current must expire at the SECOND row's ts and exactly one
    row stays current."""
    base = spark.createDataFrame([(1, _ts(1), "A")], SCHEMA)
    state = scd2_from_history(base, ["k"], "ts", ["attr"])
    batch = spark.createDataFrame([(1, _ts(4), "A"), (1, _ts(6), "B")], SCHEMA)
    out = scd2_apply_batch(state, batch, ["k"], "ts", ["attr"])
    assert _rows(out) == {
        (1, "A", _ts(1), _ts(6), False),
        (1, "B", _ts(6), None, True),
    }
