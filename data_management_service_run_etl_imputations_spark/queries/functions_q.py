"""Scalar / JSON / array / higher-order function coverage — SURVEY.md §2.7
(F1-F11) plus the engine's array/JSON surface (events.props, embeddings).
All expressions are built-in ``pyspark.sql.functions`` — zero Python UDFs —
so every derivation stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.functions.scalars import (
    duration_hours,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


@register(
    "scalar_date_string_math",
    oracle="""
        SELECT event_id,
               CAST(ts AS DATE)                          AS fecha,
               strftime(ts, '%Y-%m-%d')                  AS fecha_str,
               EXTRACT(hour FROM ts)                     AS hora,
               EXTRACT(dow FROM ts)                      AS dow,
               UPPER(event_type)                         AS event_type_uc,
               SUBSTRING(event_type, 1, 3)               AS event_type_3,
               CONCAT(event_type, ':', CAST(user_id AS VARCHAR)) AS event_tag,
               LENGTH(event_type)                        AS type_len,
               ROUND(value, 1)                           AS value_r1,
               ABS(value - 100.0)                        AS dist_from_100,
               CAST(FLOOR(value) AS BIGINT)              AS value_int,
               COALESCE(NULLIF(event_type, 'error'), 'No especificada') AS tipo_filled
        FROM events
    """,
)
def scalar_date_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4, F7-F11 umbrella — date parse/format/extract, string case/
    substring/concat/length, rounding, abs, casts, null-fill (reference:
    ``function_app.py:38-44, 101, 154, 179-180, 274, 359-360``)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_date("ts").alias("fecha"),
        F.date_format("ts", "yyyy-MM-dd").alias("fecha_str"),
        F.hour("ts").cast("long").alias("hora"),
        # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.upper("event_type").alias("event_type_uc"),
        F.substring("event_type", 1, 3).alias("event_type_3"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("event_tag"),
        F.length("event_type").cast("long").alias("type_len"),
        F.round("value", 1).alias("value_r1"),
        F.abs(F.col("value") - 100.0).alias("dist_from_100"),
        # floor, not a bare cast: Spark's double→bigint cast truncates while
        # DuckDB's rounds — floor is the portable, explicit semantic.
        F.floor("value").cast("bigint").alias("value_int"),
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")), F.lit("No especificada")
        ).alias("tipo_filled"),
    )


@register(
    "f6_session_gap_hours",
    oracle="""
        SELECT event_id, user_id,
               ROUND(epoch(ts - LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)) / 3600.0,
                     6) AS gap_hours
        FROM events
    """,
)
def f6_session_gap_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — timestamp difference → fractional hours (reference:
    ``(out-in).dt.total_seconds()/3600``, ``function_app.py:181``).
    Cast-to-double subtraction keeps sub-second precision (unix_timestamp
    truncates to seconds); here applied to per-user event gaps via LAG."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.round(duration_hours(F.col("ts"), prev_ts), 6).alias("gap_hours"),
    )


@register(
    "json_extract_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
               CAST(json_extract_string(props, '$.missing') AS BIGINT) AS prop_missing
        FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface (engine extension; testdata ``events.props`` is a
    JSON string). ``get_json_object`` pushes parsing JVM-side; missing paths
    yield null."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("prop_missing"),
    )


@register(
    "array_higher_order_norm",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dims,
               ROUND(SQRT(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
               ROUND(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE))) / len(embedding), 6) AS mean_val
        FROM embeddings
    """,
)
def array_higher_order_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column (engine
    extension; SURVEY §1.3 — ArrayType(FloatType)). transform + aggregate
    run inside codegen; this is the building block of the similarity ops."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    val_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dims"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(val_sum / F.size("embedding"), 6).alias("mean_val"),
    )
