"""Slowly-changing-dimension type-2 versioning — the dimension-side
counterpart of the reference's fact-side incremental load (S7,
``function_app.py:305-312``): instead of skipping already-present keys, a
dim change *expires* the current version and appends a new one, keeping
full history queryable as of any time.

Two tiers:
- :func:`scd2_from_history` — rebuild the whole versioned dim from a change
  log in one pass (a single ``lead()`` window; oracle-checkable SQL).
- :func:`scd2_apply_batch` — incremental merge of one change batch into an
  existing versioned dim (the per-micro-batch / per-run path; equals the
  full rebuild when folded over batches — asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Versioned dim from a full change log: one row per change, valid from
    its timestamp until the key's next change (null = still current).

    Consecutive rows with identical attributes are collapsed first (a
    re-stated unchanged value is not a new version). One window per step,
    both partitioned by the key — the second sort reuses the first's
    shuffle partitioning.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    deduped = (
        changes.withColumn(
            "__prev", F.lag(F.struct(*attr_cols)).over(w)
        )
        .filter(
            F.col("__prev").isNull()
            | (F.col("__prev") != F.struct(*attr_cols))
        )
        .drop("__prev")
    )
    return deduped.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_apply_batch(
    current: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    on_out_of_order: str = "rebuild",
) -> DataFrame:
    """Merge one change batch into an existing SCD2 dim (schema as produced
    by :func:`scd2_from_history`). Batch rows later than a key's current
    version with different attributes expire it; unchanged re-statements
    are ignored. Returns the new full dim state.

    Late-arriving data (a batch row at or before a key's current
    ``valid_from``) cannot be folded in by the incremental expire/insert
    branches — naively inserting it would leave two ``is_current`` rows for
    the key. ``on_out_of_order`` picks the policy:

    - ``"rebuild"`` (default): keys with any late row are rebuilt exactly —
      their existing versions are re-expanded into a change log, unioned
      with their batch rows, and re-run through :func:`scd2_from_history`.
      Only the affected keys pay the rebuild; in-order keys keep the cheap
      incremental path. Result equals a full rebuild over the combined log.
    - ``"drop"``: late batch rows are discarded; in-order rows still apply.
    - ``"error"``: raise ``ValueError`` if any late row exists (forces an
      eager check of the batch).

    Plan shape (in-order path): the batch is first collapsed to its own
    mini-history (the same window as the rebuild), then one left join
    against the current slice decides expire-vs-ignore — historical
    (non-current) rows pass through untouched, so at scale the join touches
    only |keys|, not |versions|. On a transactional store this is the
    classic Delta/Iceberg ``MERGE`` with an expire-update + insert branch;
    on plain parquet the returned frame is rewritten via the overwrite sink.
    """
    if on_out_of_order not in ("rebuild", "drop", "error"):
        raise ValueError(f"on_out_of_order={on_out_of_order!r}")

    key_eq_late = [F.col(c) == F.col(f"__k_{c}") for c in key_cols]
    cur_from = current.filter(F.col("is_current")).select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        F.col("valid_from").alias("__cur_from"),
    )
    late_keys = (
        batch.join(cur_from, key_eq_late)
        .filter(F.col(ts_col) <= F.col("__cur_from"))
        .select(*key_cols)
        .distinct()
    )
    if on_out_of_order == "error":
        if late_keys.limit(1).count() > 0:
            raise ValueError(
                "scd2_apply_batch: batch contains rows at or before a key's "
                "current valid_from (out-of-order data); pass "
                "on_out_of_order='rebuild' or 'drop'"
            )
        rebuild_out = None
    elif on_out_of_order == "drop":
        batch = (
            batch.join(cur_from, key_eq_late, "left")
            .filter(
                F.col("__cur_from").isNull()
                | (F.col(ts_col) > F.col("__cur_from"))
            )
            .select(*batch.columns)
        )
        rebuild_out = None
    else:  # rebuild affected keys exactly from their combined change log
        cur_late = current.join(late_keys, key_cols, "left_semi")
        batch_late = batch.join(late_keys, key_cols, "left_semi")
        log = cur_late.select(
            *key_cols, *attr_cols, F.col("valid_from").alias(ts_col)
        ).unionByName(batch_late.select(*key_cols, *attr_cols, ts_col))
        rebuild_out = scd2_from_history(log, key_cols, ts_col, attr_cols)
        current = current.join(late_keys, key_cols, "left_anti")
        batch = batch.join(late_keys, key_cols, "left_anti")

    versioned_batch = scd2_from_history(batch, key_cols, ts_col, attr_cols)

    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))
    key_eq = [F.col(c) == F.col(f"__k_{c}") for c in key_cols]

    cur_slim = cur.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        F.struct(*attr_cols).alias("__cur_attrs"),
        F.col("valid_from").alias("__cur_from"),
    )

    # The key's first EFFECTIVE change: earliest batch version whose attrs
    # differ from the current row's (a leading re-statement doesn't expire).
    bv = versioned_batch.withColumn("__b_attrs", F.struct(*attr_cols))
    eff = (
        bv.join(cur_slim, key_eq)
        .filter(
            (F.col("__b_attrs") != F.col("__cur_attrs"))
            & (F.col("valid_from") > F.col("__cur_from"))
        )
        .groupBy(*[f"__k_{c}" for c in key_cols])
        .agg(F.min("valid_from").alias("__expire_ts"))
    )
    expired = cur.join(eff, key_eq, "left").select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.coalesce(F.col("__expire_ts"), F.col("valid_to")).alias("valid_to"),
        (F.col("is_current") & F.col("__expire_ts").isNull()).alias("is_current"),
    )

    # Drop the batch's leading version when it merely re-states the current
    # attributes (after the batch's own consecutive-collapse there can be
    # at most one such leading duplicate per key).
    w = Window.partitionBy(*key_cols).orderBy("valid_from")
    dups = (
        bv.withColumn("__bn", F.row_number().over(w))
        .filter(F.col("__bn") == 1)
        .join(cur_slim, key_eq)
        .filter(F.col("__b_attrs") == F.col("__cur_attrs"))
        .select(*key_cols, F.col("valid_from").alias("__drop_from"))
    )
    new_rows = versioned_batch.join(
        dups.select(
            *[F.col(c).alias(f"__k_{c}") for c in key_cols], "__drop_from"
        ),
        key_eq + [F.col("valid_from") == F.col("__drop_from")],
        "left_anti",
    )

    out = hist.unionByName(expired).unionByName(new_rows)
    if rebuild_out is not None:
        out = out.unionByName(rebuild_out)
    return out
