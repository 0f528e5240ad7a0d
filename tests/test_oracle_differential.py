"""Differential test mirroring the driver's t2 gate: every catalog query with
an oracle must match DuckDB on the same parquet (row count + sorted values).

Runs at sf0.001 by default for speed; the driver runs sf0.01. Set
SPARK_GRAFT_TEST_SF_DIR to widen locally.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from data_management_service_run_etl_imputations_spark import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duckdb_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, colnames):
    """Order-insensitive, column-name-sorted, float-rounded row multiset."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 6)
                if isinstance(v, float) and math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


_ORACLES = catalog.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_duckdb_oracle(spark, name):
    q = catalog.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duckdb_conn()
    res = con.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column sets differ: spark={spark_cols} duck={duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    norm_s = _normalize(spark_rows, spark_cols)
    norm_d = _normalize(duck_rows, duck_cols)
    if norm_s != norm_d:
        diff = [(a, b) for a, b in zip(norm_s, norm_d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
