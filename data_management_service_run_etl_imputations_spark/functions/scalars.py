"""Scalar/column helpers — SURVEY.md §2.7 (F1-F11), JVM-side only.

Every helper returns a Column expression built from ``pyspark.sql.functions``
so the whole derivation stays inside whole-stage codegen; none of these drop
to Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F1/F2 — string → timestamp (reference: pd.to_datetime, function_app.py:179-180, 261-262)


def parse_timestamp(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, fmt)


# F3 — timestamp → date (reference: .dt.date, function_app.py:154)


def parse_date(col: Column | str, fmt: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, fmt) if fmt else F.to_date(c)


# F4 — date formatting (reference: strftime("%Y-%m-%d"), function_app.py:101)


def to_date_str(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    return F.date_format(F.col(col) if isinstance(col, str) else col, fmt)


# F6 — timestamp difference in hours (reference: total_seconds()/3600,
# function_app.py:181). Cast-to-double keeps sub-second precision and stays
# in codegen (unix_timestamp would truncate to whole seconds).


def duration_hours(t_out: Column | str, t_in: Column | str) -> Column:
    out_c = F.col(t_out) if isinstance(t_out, str) else t_out
    in_c = F.col(t_in) if isinstance(t_in, str) else t_in
    return (out_c.cast("double") - in_c.cast("double")) / F.lit(3600.0)


# F7 — case-insensitive containment (reference: a.lower() in b.lower(),
# function_app.py:254). Used by the fuzzy containment join (J6).


def contains_ci(haystack: Column | str, needle: Column | str) -> Column:
    h = F.col(haystack) if isinstance(haystack, str) else haystack
    n = F.col(needle) if isinstance(needle, str) else needle
    return F.instr(F.lower(h), F.lower(n)) > 0


# F8 — per-column null fill (reference: fillna dict, function_app.py:274, 341)


def fill_nulls(df: DataFrame, values: dict) -> DataFrame:
    return df.na.fill(values)
