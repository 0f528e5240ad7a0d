"""Aggregation patterns — SURVEY.md §2.4 (A1-A4) as reusable operators.

A3/A4 (multi-agg group-bys) are plain ``groupBy().agg()`` written inline at
call sites; the two patterns worth naming are the *keep-one-row-per-group*
family the reference encodes with pandas ``last``/``idxmax``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list, keep: list[str] | None = None
) -> DataFrame:
    """A2 — keep the single row per key group that sorts first by ``order_by``
    (reference: ``idxmax`` on ``updated_at`` + ``.loc``,
    ``function_app.py:263-264``; pass ``F.desc("updated_at")`` plus a unique
    tie-break to make the choice deterministic, which pandas' idxmax only is
    by accident of row order).

    Scale: one shuffle on ``keys``; Spark turns the rank-1 window into a
    partial top-1 per map partition (WindowGroupLimit) so the shuffle carries
    only candidate rows, not the full table.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    out = out.drop("__rn")
    return out.select(*keep) if keep else out


def dedup_keep_last(
    df: DataFrame, keys: list[str], order_by: list | None = None
) -> DataFrame:
    """A1 — collapse duplicate keys keeping the "last" row
    (reference: ``groupby("DNI").agg({"empleado_id": "last"})``,
    ``function_app.py:200-202`` — "last" there means unspecified DB read
    order). The engine requires an explicit ``order_by``; "last" is its
    descending first row.
    """
    if order_by is None:
        raise ValueError(
            "dedup_keep_last needs an explicit order_by: the reference's "
            "'last' relied on unspecified row order (function_app.py:200-202)"
        )
    return latest_per_key(df, keys, order_by)


def weighted_mean_udaf():
    """§2.8 UDAF surface — a GROUPED_AGG pandas UDF (Arrow-batched custom
    aggregate; the fourth UDF shape next to grouped-map, mapInPandas and
    applyInPandasWithState). Returns the weighted mean Σ(v·w)/Σ(w) of two
    integer columns.

    Spark plans it like any declarative aggregate (one hash shuffle on
    the group key; partial aggregation is NOT available to pandas UDAFs —
    each group's values stream to one task, which is the documented cost
    of a custom aggregate vs built-ins; prefer built-ins where they
    exist).

    Determinism note: with INTEGER inputs the sums are exact int64 (no
    float accumulation order), so Σ(v·w) and Σ(w) are engine-portable and
    the final division is one IEEE op — which is what lets the catalog
    query oracle-check a custom Python aggregate bit-for-bit.
    """

    @F.pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        num = int((v * w).sum())
        den = int(w.sum())
        return float(num) / float(den) if den else None

    return weighted_mean


def int_sum_udaf():
    """Companion GROUPED_AGG pandas UDF (exact int64 sum): Spark refuses
    to mix pandas and non-pandas aggregates in one ``agg()``
    (INVALID_PANDAS_UDF_PLACEMENT), so an all-pandas aggregation list
    needs its plain sums in pandas form too."""

    @F.pandas_udf("long")
    def int_sum(w: pd.Series) -> int:
        return int(w.sum())

    return int_sum
