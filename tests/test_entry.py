from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "fecha",
        "customer_key",
        "customer_name",
        "revenue",
        "sum_qty",
        "n_lines",
    }


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
