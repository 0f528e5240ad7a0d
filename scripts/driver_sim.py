"""Driver simulation: drive the __spark_entry__ contract exactly as the
round driver does — entry() smoke, then every queries() entry vs its
oracle_sql() on DuckDB over the same parquet, compared through the driver's
canonicalizer (columns sorted by name, floats rounded to 6, rows sorted over
all columns, dtype-sensitive cell strings).

Usage: PYTHONPATH=/root/repo python scripts/driver_sim.py [sf_dir] [max_n]
Prints one status line per query and a JSON summary; exit 1 on any red.
"""

from __future__ import annotations

import datetime
import json
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf.copy()
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype.kind == "f":
            pdf[c] = col.round(6)
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date):
                pdf[c] = pd.to_datetime(col)
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return [
        "|".join(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    max_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    smoke = __spark_entry__.entry(spark)
    n = smoke.count()
    print(f"entry() smoke: {n} rows, schema ok", flush=True)
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    results: dict[str, dict] = {}
    n_green = n_rows_only = n_red = 0
    for i, (name, fn) in enumerate(qs.items()):
        if i >= max_n:
            break
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            if name not in oracles:
                results[name] = {"status": "rows_only", "rows": len(spark_pdf)}
                n_rows_only += 1
                print(f"[{i:2d}] {name}: rows_only ({len(spark_pdf)})", flush=True)
                continue
            duck_pdf = con.execute(oracles[name]).df()
            rows_ok = len(spark_pdf) == len(duck_pdf)
            cols_ok = sorted(c.lower() for c in spark_pdf.columns) == sorted(
                c.lower() for c in duck_pdf.columns
            )
            hash_ok = rows_ok and cols_ok and canon(spark_pdf) == canon(duck_pdf)
            status = "green" if hash_ok else "RED"
            if hash_ok:
                n_green += 1
            else:
                n_red += 1
            results[name] = {
                "status": status,
                "rows": len(spark_pdf),
                "oracle_rows": len(duck_pdf),
                "rows_match": rows_ok,
                "cols_match": cols_ok,
            }
            print(f"[{i:2d}] {name}: {status} ({len(spark_pdf)} rows)", flush=True)
        except Exception:
            n_red += 1
            results[name] = {
                "status": "RED",
                "err": traceback.format_exc(limit=3),
            }
            print(f"[{i:2d}] {name}: RED (exception)", flush=True)
            traceback.print_exc(limit=3)
    print(
        json.dumps(
            {"green": n_green, "rows_only": n_rows_only, "red": n_red, "sf": sf_dir}
        )
    )
    spark.stop()
    return 1 if n_red else 0


if __name__ == "__main__":
    sys.exit(main())
