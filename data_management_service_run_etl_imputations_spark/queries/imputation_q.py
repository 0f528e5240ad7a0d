"""Missing-value imputation queries (the repo-name pun, north_star item).

The testdata has no nulls, so missingness is synthesized deterministically
(values of 'error' events are treated as missing) — both engines apply the
identical mask, then impute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.imputation import (
    impute_forward_fill,
    impute_linear_interpolate,
    impute_regression,
    impute_with_group_stats,
    resample_ffill,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table

_MASK = "CASE WHEN event_type = 'error' THEN NULL ELSE value END"


@register(
    "impute_group_mean",
    headline=True,
    oracle=f"""
        SELECT event_id, user_id,
               ROUND(COALESCE({_MASK},
                              AVG({_MASK}) OVER (PARTITION BY user_id),
                              AVG({_MASK}) OVER ()), 6) AS value_imputed
        FROM events
    """,
)
def impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation: null values filled with the per-user mean,
    falling back to the global mean for all-null groups. One window, no
    self-join."""
    events = load_table(spark, sf_dir, "events")
    masked = events.withColumn(
        "value_masked",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    out = impute_with_group_stats(
        masked, "value_masked", ["user_id"], strategy="mean", out_col="value_imputed"
    )
    return out.select(
        "event_id", "user_id", F.round("value_imputed", 6).alias("value_imputed")
    )


@register(
    "impute_group_median",
    oracle=f"""
        WITH g AS (
            SELECT user_id, median({_MASK}) AS med
            FROM events GROUP BY user_id
        ),
        gstat AS (SELECT median({_MASK}) AS gmed FROM events)
        SELECT e.event_id, e.user_id,
               ROUND(COALESCE({_MASK}, g.med, gstat.gmed), 6) AS value_imputed
        FROM events e
        LEFT JOIN g ON e.user_id = g.user_id
        CROSS JOIN gstat
    """,
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation (exact median; swap to approx_percentile at
    extreme scale)."""
    events = load_table(spark, sf_dir, "events")
    masked = events.withColumn(
        "value_masked",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    out = impute_with_group_stats(
        masked, "value_masked", ["user_id"], strategy="median", out_col="value_imputed"
    )
    return out.select(
        "event_id", "user_id", F.round("value_imputed", 6).alias("value_imputed")
    )


@register(
    "impute_forward_fill",
    oracle=f"""
        SELECT event_id, user_id,
               ROUND(last_value({_MASK} IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 6) AS value_ff
        FROM events
    """,
)
def impute_forward_fill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF) imputation: per-user event series in time order,
    nulls carry the last observed value forward; leading nulls stay null.
    One running window — no self-join, no driver round-trip."""
    events = load_table(spark, sf_dir, "events")
    masked = events.withColumn(
        "value_masked",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    out = impute_forward_fill(
        masked,
        "value_masked",
        order_cols=["ts", "event_id"],
        group_cols=["user_id"],
        out_col="value_ff",
    )
    return out.select(
        "event_id", "user_id", F.round("value_ff", 6).alias("value_ff")
    )


@register(
    "impute_ml_global_mean",
    oracle=f"""
        SELECT event_id,
               ROUND(COALESCE({_MASK}, AVG({_MASK}) OVER ()), 6)
                   AS value_imputed
        FROM events
    """,
)
def impute_ml_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib path (north_star: 'MLlib for missing value handling'):
    pyspark.ml.feature.Imputer with the mean strategy — fit computes the
    non-null column mean, transform fills. Oracle: global-mean COALESCE."""
    from data_management_service_run_etl_imputations_spark.operators.imputation import (
        ml_imputer,
    )

    events = load_table(spark, sf_dir, "events")
    masked = events.withColumn(
        "value_masked",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    out = ml_imputer(masked, ["value_masked"], strategy="mean")
    return out.select(
        "event_id", F.round("value_masked_imputed", 6).alias("value_imputed")
    )


@register(
    "impute_linear_interpolate",
    oracle=f"""
        WITH masked AS (
            SELECT event_id, user_id, ts, {_MASK} AS v,
                   epoch(ts) AS t
            FROM events
        ), ctx AS (
            SELECT event_id, user_id, v, t,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                       OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS prev_t,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                       OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS next_t
            FROM masked
        )
        SELECT event_id, user_id,
               ROUND(CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                        AND next_t > prev_t
                   THEN prev_v + (next_v - prev_v) * (t - prev_t)
                                 / (next_t - prev_t)
                   ELSE COALESCE(prev_v, next_v)
               END, 6) AS value_li
        FROM ctx
    """,
)
def impute_linear_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation per user series: nulls take the
    value proportional to their position between the nearest non-null
    neighbors; one-sided gaps fall back to ffill/bfill. Two shared-sort
    window frames, one shuffle (operators/imputation.py
    impute_linear_interpolate)."""
    events = load_table(spark, sf_dir, "events")
    masked = events.withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = impute_linear_interpolate(
        masked,
        "v",
        "ts",
        group_cols=["user_id"],
        out_col="value_li",
        order_cols=["ts", "event_id"],
    )
    return out.select(
        "event_id", "user_id", F.round("value_li", 6).alias("value_li")
    )


@register(
    "impute_regression_trend",
    oracle="""
        WITH base AS (
            SELECT event_id, user_id,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE CAST(ROUND(value, 0) AS BIGINT) END AS y,
                   CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS xh
            FROM events
        ),
        feat AS (
            SELECT event_id, user_id, y,
                   xh - MIN(xh) OVER (PARTITION BY user_id) AS x
            FROM base
        ),
        sums AS (
            SELECT event_id, user_id, y, x,
                   COUNT(CASE WHEN y IS NOT NULL THEN x END) OVER w AS n,
                   SUM(CASE WHEN y IS NOT NULL THEN x END) OVER w AS sx,
                   SUM(CASE WHEN y IS NOT NULL THEN y END) OVER w AS sy,
                   SUM(CASE WHEN y IS NOT NULL THEN x * x END) OVER w AS sxx,
                   SUM(CASE WHEN y IS NOT NULL THEN x * y END) OVER w AS sxy,
                   AVG(CASE WHEN y IS NOT NULL THEN y END) OVER () AS gmean
            FROM feat
            WINDOW w AS (PARTITION BY user_id)
        ),
        fit AS (
            SELECT event_id, user_id, y, x, n, sx, sy, gmean,
                   CASE WHEN n * sxx - sx * sx <> 0
                        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   END AS b
            FROM sums
        )
        SELECT event_id, user_id,
               (y IS NULL) AS was_imputed,
               ROUND(CASE
                   WHEN y IS NOT NULL THEN CAST(y AS DOUBLE)
                   WHEN ((sy - b * sx) / n) + b * x IS NOT NULL
                       THEN ((sy - b * sx) / n) + b * x
                   ELSE COALESCE(CASE WHEN n > 0 THEN sy / n END, gmean)
               END, 6) AS value_imputed
        FROM fit
    """,
)
def impute_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-BASED imputation (VERDICT r03 #8): per-user OLS of the
    (integer-scaled) event value against hours-since-first-event; masked
    'error' values are predicted from each user's own trend line, not a
    flat mean. Closed-form masked-window-sum fit — one shuffle, no
    fit/transform round trip (operators/imputation.py impute_regression).

    Cross-engine exactness: y is rounded to integer units and x is the
    hour index centered per segment, so every OLS sum is INTEGER (exact
    in both engines — no float-accumulation-order divergence); the
    closed-form slope/intercept then divide identical integers, giving
    bit-identical doubles. The float-y recovery semantics are pinned by
    the planted-signal unit test (tests/test_extensions.py)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.round("value", 0).cast("long"))
        .alias("y"),
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("xh"),
    )
    from pyspark.sql import Window

    feat = base.withColumn(
        "x",
        F.col("xh") - F.min("xh").over(Window.partitionBy("user_id")),
    )
    out = impute_regression(
        feat, "y", "x", ["user_id"], out_col="value_imputed"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("y").isNull().alias("was_imputed"),
        F.round("value_imputed", 6).alias("value_imputed"),
    )


@register(
    "events_resample_hourly_ffill",
    oracle="""
        WITH ev AS (
            SELECT user_id, ts, max_by(value, event_id) AS v
            FROM events GROUP BY user_id, ts
        ),
        spans AS (
            SELECT user_id,
                   -- ::TIMESTAMP: to_timestamp returns TIMESTAMPTZ, which
                   -- would tz-tag the whole grid; Spark emits naive UTC
                   CAST(to_timestamp(floor(epoch(MIN(ts)) / 3600) * 3600)
                        AS TIMESTAMP) AS t0,
                   MAX(ts) AS t1
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS t
            FROM spans
        ),
        u AS (
            SELECT user_id, ts AS t, 0 AS is_grid, v FROM ev
            UNION ALL
            SELECT user_id, t, 1, NULL FROM grid
        ),
        f AS (
            SELECT user_id, t, is_grid,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY t, is_grid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS fv
            FROM u
        )
        SELECT user_id, t AS grid_ts, ROUND(fv, 6) AS last_value
        FROM f WHERE is_grid = 1
    """,
)
def events_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + LOCF: per user, an hourly grid spanning the
    user's activity, each point carrying the last observation at-or-before
    it (TSDB ``time_bucket_gapfill``/``locf``). sequence+explode spine, one
    per-key window fill, no per-point join (operators/imputation.py
    resample_ffill)."""
    events = load_table(spark, sf_dir, "events")
    return resample_ffill(
        events, "user_id", "ts", "value", "event_id", step_seconds=3600
    )
