"""Data-quality expectations — rule-based validation for pipeline gates
(the Great-Expectations / Delta-constraints shape, engine extension
alongside profiling's column stats).

A rule is ``name -> boolean Column``; validation is ONE aggregate pass
over the table (every rule folds to ``SUM(CASE WHEN NOT rule ...)``
inside the same partial-aggregated scan — adding rules adds columns, not
jobs), then an unpivot to one row per rule. Referential and uniqueness
rules are plain columns too: build the flag with a join / window first,
then write the rule against the flag — everything stays declarative, so
the whole check is oracle-checkable and Catalyst-optimizable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_expectations(
    df: DataFrame, rules: dict[str, F.Column]
) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, pass_rate).

    A NULL rule result counts as a VIOLATION (unknown is not a pass —
    the same stance SQL CHECK constraints take on the opposite side;
    pipelines gate on proven-good rows).

    Scale: a single full-scan hash aggregate (map-side partial) emitting
    |rules| counters; the unpivot runs on that 1-row frame. pass_rate is
    exact-integer division rounded to 6.
    """
    if not rules:
        raise ValueError("validate_expectations needs at least one rule")
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(rules)}, {stack_expr}) AS (rule, n_violations)"
        ),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(
            (F.col("n_rows") - F.col("n_violations"))
            / F.col("n_rows"),
            6,
        ).alias("pass_rate"),
    )


def with_expectations(
    df: DataFrame, rules: dict[str, F.Column], out_col: str = "failed_rules"
) -> DataFrame:
    """Tag every row with the ARRAY of rule names it violates (empty =
    clean). The row-level companion of :func:`validate_expectations`,
    sharing its NULL-is-a-violation stance: a rule evaluating to NULL
    puts its name in the array.

    Scale: pure per-row column expressions over the same single scan the
    aggregate gate uses — no shuffle, no UDF; ``array_compact`` drops the
    per-rule ``NULL`` placeholders of passing rules."""
    if not rules:
        raise ValueError("with_expectations needs at least one rule")
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in rules.items()
    ]
    return df.withColumn(out_col, F.array_compact(F.array(*flags)))


def route_expectations(
    df: DataFrame, rules: dict[str, F.Column], out_col: str = "failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into ``(pass_df, quarantine_df)``: rows violating no
    rule flow through unchanged; violating rows are ROUTED — not silently
    dropped — carrying the ``failed_rules`` array so the quarantine sink
    records WHY each row was held (the reference drops bad rows with no
    trace, ``function_app.py:227,268`` — this is the production gate that
    defect motivates).

    Both frames filter the SAME tagged plan; a caller writing both sinks
    should ``persist()`` the tagged frame (or split inside
    ``foreachBatch``) so the source scans once."""
    tagged = with_expectations(df, rules, out_col=out_col)
    pass_df = tagged.filter(F.size(out_col) == 0).drop(out_col)
    quarantine_df = tagged.filter(F.size(out_col) > 0)
    return pass_df, quarantine_df
