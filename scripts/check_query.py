"""Check ONE catalog query against its DuckDB oracle exactly the way
scripts/driver_sim.py does (column-name-sorted values, floats rounded
to 6, mergesort row order) — the fast feedback loop while authoring a
new query: ``python scripts/check_query.py <name> [sf_dir]``."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _norm(pdf):
    import datetime

    import pandas as pd

    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            # mirror driver_sim.canon EXACTLY: date objects normalize to
            # datetime so a DATE column compares equal to an oracle
            # TIMESTAMP at midnight (drift between the two canonicalizers
            # is a false-red generator)
            sample = pdf[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date):
                pdf[c] = pd.to_datetime(pdf[c])
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
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("check_query")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    spark_pdf = qs[name](spark, sf_dir).toPandas()
    if name not in oracles:
        print(f"{name}: rows-only query, {len(spark_pdf)} rows")
        print(spark_pdf.head(10))
        spark.stop()
        return 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_pdf = con.execute(oracles[name]).fetchdf()
    a, b = _norm(spark_pdf), _norm(duck_pdf)
    rows_ok = len(a) == len(b)
    cols_ok = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    hash_ok = a == b
    print(
        f"{name}: rows={len(a)}/{len(b)} rows_match={rows_ok} "
        f"cols_match={cols_ok} hash_match={hash_ok}"
    )
    if not hash_ok:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  first diff at row {i}:\n    spark : {x}\n    oracle: {y}")
                break
        if len(a) != len(b):
            print(f"  spark head: {a[:3]}\n  oracle head: {b[:3]}")
    spark.stop()
    return 0 if (hash_ok and cols_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
