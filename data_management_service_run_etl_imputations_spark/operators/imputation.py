"""Missing-value imputation — the north-star extension the repo name puns on
(BASELINE.json: "maps to Spark's DataFrame operations and MLlib for missing
value handling").

Two tiers:
- :func:`impute_with_group_stats` — SQL-expressible global/group-wise
  mean/median fill via window functions (oracle-checkable).
- :func:`ml_imputer` — ``pyspark.ml.feature.Imputer`` (mean/median/mode),
  the MLlib path for feature pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_with_group_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    strategy: str = "mean",
    out_col: str | None = None,
) -> DataFrame:
    """Fill nulls in ``value_col`` with the group (or global) statistic.

    mean/median ignore nulls (matching every SQL engine). Groups that are
    entirely null fall back to the global statistic; if that is also null
    the value stays null.

    Scale: with group_cols this is one ROLLUP aggregate (group + global
    stats in a single data pass, partial agg map-side) followed by a
    broadcast equi-join of the group-count-sized dim — the fact table is
    never funneled through a single partition, and no window runs over it
    at all. Without group_cols it is a 1-row aggregate broadcast back onto
    every row. median uses the exact percentile; swap for
    approx_percentile at extreme scale.
    """
    if strategy == "mean":
        agg = F.avg
    elif strategy == "median":
        agg = F.median
    else:
        raise ValueError(f"unknown strategy: {strategy!r} (mean|median)")

    out_col = out_col or value_col

    if not group_cols:
        # Global-only fill: a 1-row aggregate broadcast back onto every row.
        # NOT Window.partitionBy() — an unpartitioned window forces the whole
        # fact table through a SinglePartition exchange; the 1-row broadcast
        # NLJ costs nothing and keeps the scan fully parallel.
        gstats = df.agg(agg(value_col).alias("__gstat"))
        out = df.crossJoin(F.broadcast(gstats)).withColumn(
            out_col, F.coalesce(F.col(value_col), F.col("__gstat"))
        )
        return out.drop("__gstat")

    # Group + global in ONE pass over the data, then a broadcast equi-join
    # of the group-count-sized dim back onto the fact table (group keys
    # may be NULL; <=> is still a hash-join key). The global fallback is
    # smeared across the tiny dim with an unpartitioned window —
    # single-partition over #groups rows, exactly the set being broadcast
    # anyway. Net plan: one data-scale aggregate exchange + one
    # BroadcastHashJoin. No global window over the fact table, no
    # cartesian/NLJ node anywhere.
    keyed = [f"__k_{i}" for i in range(len(group_cols))]
    w_dim = Window.partitionBy()
    if strategy == "mean":
        # mean RE-AGGREGATES: the global mean composes from the group
        # partials (Σ sums / Σ counts), so one plain groupBy suffices —
        # no rollup Expand doubling the rows through the aggregate.
        g1 = df.groupBy(*group_cols).agg(
            F.sum(value_col).alias("__s"),
            F.count(value_col).alias("__c"),
        )
        tot_s = F.sum("__s").over(w_dim)
        tot_c = F.sum("__c").over(w_dim)
        dim = g1.select(
            *[F.col(c).alias(k) for c, k in zip(group_cols, keyed)],
            F.when(F.col("__c") > 0, F.col("__s") / F.col("__c")).alias(
                "__gstat"
            ),
            F.when(tot_c > 0, tot_s / tot_c).alias("__global"),
        )
    else:
        # median does NOT re-aggregate — ROLLUP computes the per-group
        # rows (grouping_id == 0) and the grand-total row in one hash
        # aggregate (Expand factor k+1, partial agg map-side).
        total_gid = (1 << len(group_cols)) - 1
        rolled = df.rollup(*group_cols).agg(
            F.grouping_id().alias("__gid"), agg(value_col).alias("__gstat")
        )
        global_stat = F.max(
            F.when(F.col("__gid") == total_gid, F.col("__gstat"))
        ).over(w_dim)
        dim = (
            rolled.withColumn("__global", global_stat)
            .filter(F.col("__gid") == 0)
            .select(
                *[F.col(c).alias(k) for c, k in zip(group_cols, keyed)],
                "__gstat",
                "__global",
            )
        )
    cond = None
    for c, k in zip(group_cols, keyed):
        clause = df[c].eqNullSafe(dim[k])
        cond = clause if cond is None else (cond & clause)
    out = df.join(F.broadcast(dim), cond, "left").withColumn(
        out_col,
        F.coalesce(F.col(value_col), F.col("__gstat"), F.col("__global")),
    )
    return out.drop("__gstat", "__global", *keyed)


def impute_forward_fill(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Time-series forward fill (LOCF — last observation carried forward):
    nulls take the most recent non-null value within the group, in
    ``order_cols`` order. Leading nulls (no prior observation) stay null.

    Scale: one running window per group — ``last(ignorenulls=True)`` over
    ROWS UNBOUNDED PRECEDING is a single-pass frame, no self-join, no
    driver round-trip. With time-partitioned input, partition by the series
    key so each group sorts locally within its shuffle partition.
    """
    out_col = out_col or value_col
    w = (
        Window.partitionBy(*(group_cols or []))
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.last(value_col, ignorenulls=True).over(w)
    )


def ml_imputer(
    df: DataFrame,
    input_cols: list[str],
    strategy: str = "median",
    suffix: str = "_imputed",
) -> DataFrame:
    """MLlib Imputer: fit per-column statistics, transform to ``*{suffix}``
    output columns. Strategies: mean | median | mode."""
    from pyspark.ml.feature import Imputer

    imputer = Imputer(
        inputCols=input_cols,
        outputCols=[c + suffix for c in input_cols],
        strategy=strategy,
    )
    return imputer.fit(df).transform(df)


def impute_linear_interpolate(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted linear interpolation: each null takes
    ``v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)``
    between its nearest non-null neighbors in time order. Leading/trailing
    nulls (one-sided gaps) fall back to the available neighbor (ffill/bfill
    semantics); equal neighbor timestamps fall back to the previous value
    (no division by zero under ANSI mode). Pass ``order_cols`` with a
    unique tiebreaker (e.g. ``[ts, event_id]``) — a ts-only sort is
    nondeterministic under timestamp ties at scale.

    Scale: two single-pass window frames per group (running ``last`` and
    ``first`` with ignorenulls) — no self-join, no gap enumeration, state
    bounded by the frame. The frames share one partition-by sort, so the
    whole operator is one shuffle on the series key.
    """
    out_col = out_col or value_col
    keys = group_cols or []
    order = order_cols or [ts_col]
    t = F.col(ts_col).cast("double")
    back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(
            prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t), interp
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return df.withColumn(out_col, filled)


def impute_regression(
    df: DataFrame,
    value_col: str,
    feature_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """MODEL-BASED imputation (the north star's "MLlib for missing value
    handling" beyond per-group statistics): per segment, fit a simple
    linear regression ``y = a + b·x`` on the observed (non-null) rows via
    closed-form OLS, and predict each null from its feature. Strictly
    more informative than mean-fill whenever the value trends with an
    observed covariate (time, volume, …).

    Fallback ladder: a null row whose segment fit is degenerate
    (fewer than 2 observations, or zero feature variance) takes the
    segment mean of observed values; an all-null segment takes the global
    mean; if that is null too the value stays null. Rows with a null
    FEATURE also fall back (no x to predict from).

    Scale: everything is masked window aggregates over the segment key
    (count/sum of x, y, x², x·y) — ONE shuffle, no fit/transform round
    trip, no driver-side model state; the closed-form slope
    ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` composes from those sums.
    With INTEGER x and y the sums stay exact (engine-portable to the
    last bit — the oracle-checked catalog query uses that); guard the
    int64 headroom ``n·Σx² < 2^63`` by centering x (e.g. subtracting its
    segment minimum) before calling.
    """
    out_col = out_col or value_col
    keys = group_cols or []
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    y, x = F.col(value_col), F.col(feature_col)
    obs = y.isNotNull() & x.isNotNull()
    mx, my = F.when(obs, x), F.when(obs, y)

    # Global-mean fallback as a broadcast 1-row aggregate, NOT a
    # Window.partitionBy() — an unpartitioned window forces the plan to
    # SinglePartition, and Catalyst then satisfies the SEGMENT window on
    # that single partition too: the whole operator would funnel through
    # one task. The 1-row broadcast NLJ keeps the segment window hash-
    # partitioned (same bounded-cross pattern as the TPC-H scalar
    # subqueries).
    gstats = df.agg(F.avg(my).alias("__gmean"))
    df = df.crossJoin(F.broadcast(gstats))

    n = F.count(mx).over(w)
    sx = F.sum(mx).over(w)
    sy = F.sum(my).over(w)
    sxx = F.sum(F.when(obs, x * x)).over(w)
    sxy = F.sum(F.when(obs, x * y)).over(w)

    den = n * sxx - sx * sx
    b = F.when(den != 0, (n * sxy - sx * sy) / den)
    a = (sy - b * sx) / n
    pred = a + b * x
    seg_mean = F.when(n > 0, sy / n)

    filled = (
        F.when(y.isNotNull(), y.cast("double"))
        .when(pred.isNotNull(), pred)
        .otherwise(F.coalesce(seg_mean, F.col("__gmean")))
    )
    return df.withColumn(out_col, filled).drop("__gmean")


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Resample an irregular per-key time series onto a regular grid with
    forward fill — every TSDB's ``resample`` / ``LOCF`` operator: per key,
    grid points run from ``floor(min ts / step)`` to ``max ts``; each
    carries the last observed value at-or-before it (NULL before the first
    observation).

    Plan shape (no per-grid-point join, no UDF): per-key span aggregate →
    ``sequence``+``explode`` builds the grid; the grid UNIONs with the
    (per-(key, ts) deduped, max-``order_col``-wins) observations; ONE
    window per key ordered by (ts, is_grid) forward-fills with
    ``last(ignorenulls)``; grid rows are kept. Grid cardinality is
    span/step per key — the union shuffle is the only wide op, and it is
    partitioned by key.
    """
    ev = (
        events.groupBy(key_col, ts_col)
        .agg(F.max_by(value_col, order_col).alias("__v"))
        .select(
            F.col(key_col),
            F.col(ts_col).alias("__t"),
            F.lit(0).alias("__is_grid"),
            F.col("__v"),
        )
    )
    spans = events.groupBy(key_col).agg(
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.min(ts_col)) / step_seconds)
            * step_seconds
        ).alias("__t0"),
        F.max(ts_col).alias("__t1"),
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(
                F.col("__t0"),
                F.col("__t1"),
                F.expr(f"INTERVAL {step_seconds} SECOND"),
            )
        ).alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast("double").alias("__v"),
    )
    unioned = ev.unionByName(grid)
    w = (
        Window.partitionBy(key_col)
        .orderBy("__t", "__is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__filled", F.last("__v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__is_grid") == 1).select(
        F.col(key_col),
        F.col("__t").alias("grid_ts"),
        F.round("__filled", 6).alias("last_value"),
    )
