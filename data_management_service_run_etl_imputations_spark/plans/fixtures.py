"""Deterministic FIXTURES.md-shaped synthetic inputs, shared by the pipeline
unit tests and the catalog's pipeline-parity queries (whose DuckDB oracles
inline the same rows as VALUES).

The rows exercise every generator constraint in FIXTURES.md: overlapping
fuzzy dim names (first-match-wins), a no-match company, duplicate DNIs,
multiple department assignations per employee, nulls in comment/tags, an
employee absent from dim_empleado, multiple entries per grain, and a
cross-midnight duration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_management_service_run_etl_imputations_spark.schemas import FIXTURE_SCHEMAS

E1, E2, E3 = "emp-guid-1", "emp-guid-2", "emp-guid-3"

FIXTURE_ROWS: dict[str, list[tuple]] = {
    "time_entries": [
        ("2024-03-01 09:00:00", "2024-03-01 11:00:00", "taskA", E1, "projX", "tag1"),
        ("2024-03-01 14:00:00", "2024-03-01 15:00:00", "taskA", E1, "projX", "tag1"),
        ("2024-03-01 23:30:00", "2024-03-02 01:00:00", None, E1, "projX", None),
        ("2024-03-01 08:00:00", "2024-03-01 16:00:00", "taskB", E2, "projY", "tag2"),
        ("2024-03-01 10:00:00", "2024-03-01 12:00:00", "taskC", E3, "projZ", None),
    ],
    "employees": [
        (E1, "ACME HOLDINGS S.L.", 50.0, "DNI-1", "active"),
        (E2, "Globex Corporation", 60.0, "DNI-2", "active"),
        (E3, "Initech Unknown", 70.0, "DNI-3", "inactive"),
    ],
    "worked_hours": [
        (E1, 7200.0, 28800.0, -21600.0, "2024-03-01"),
        (E1, 3600.0, 0.0, 3600.0, "2024-03-01"),
        (E2, 28800.0, 28800.0, 0.0, "2024-03-01"),
        (E3, 14400.0, 28800.0, -14400.0, "2024-03-01"),
    ],
    "department_assignations": [
        (E1, "Engineering Dept", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
        (E1, "Data & Analytics", "2024-02-01 00:00:00", "2024-02-15 00:00:00"),
        (E2, "Engineering Dept", "2024-01-05 00:00:00", "2024-01-05 00:00:00"),
    ],
    "dim_empleado": [(11, "DNI-1"), (21, "DNI-2"), (22, "DNI-2")],
    "dim_empresa": [(1, "acme holdings"), (2, "acme"), (3, "globex")],
    "dim_departamento": [(100, "engineering"), (200, "data")],
}


def _spark_literal(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if isinstance(v, str):
        # Spark SQL string literals parse backslash escapes by default
        # (spark.sql.parser.escapedStringLiterals=false): escape the
        # backslash itself, then double the quotes (ADVICE r12)
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        # repr() would render bare identifiers (nan/inf) that fail
        # analysis; Spark accepts the string forms via CAST
        s = "NaN" if v != v else ("Infinity" if v > 0 else "-Infinity")
        return f"CAST('{s}' AS {sql_type})"
    return f"CAST({v!r} AS {sql_type})"


def build_fixture_frames(spark: SparkSession) -> dict[str, DataFrame]:
    """Fixture tables as ``VALUES``-backed LocalRelations (not
    ``createDataFrame``, which pickles rows into a Python RDD): a
    LocalRelation's collect/take/broadcast all short-circuit driver-side
    with NO Spark job, so the pipelines' plan-time dim probes (J6's
    bounded dim collect) and the broadcast builds of the tiny dims stop
    paying per-job latency — the manifest-MERGE headline's plan-build
    phase measured 8 Spark jobs before, 0 after (guide §2.4: remove work
    outright rather than speed it up). Values are rendered with explicit
    casts so the column names and TYPES equal FIXTURE_SCHEMAS exactly
    (nullability may resolve narrower for all-non-null columns — the
    engine's schema comparisons are simpleString-based, which is
    nullability-insensitive; ADVICE r12)."""
    _SQL_TYPE = {"string": "STRING", "double": "DOUBLE", "int": "INT"}
    frames: dict[str, DataFrame] = {}
    for name, rows in FIXTURE_ROWS.items():
        schema = FIXTURE_SCHEMAS[name]
        types = [_SQL_TYPE[f.dataType.simpleString()] for f in schema.fields]
        cols = ", ".join(f"`{f.name}`" for f in schema.fields)
        body = ",\n".join(
            "(" + ", ".join(_spark_literal(v, t) for v, t in zip(row, types)) + ")"
            for row in rows
        )
        frames[name] = spark.sql(
            f"SELECT * FROM VALUES\n{body}\nAS t({cols})"
        )
    return frames


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return repr(v)


def fixture_values_cte(name: str, columns: list[str]) -> str:
    """Render a fixture table as a `name(cols) AS (VALUES ...)` CTE body for
    the DuckDB oracle, guaranteeing oracle and Spark see identical rows."""
    rows = ",\n        ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")"
        for row in FIXTURE_ROWS[name]
    )
    return f"{name}({', '.join(columns)}) AS (VALUES\n        {rows})"
