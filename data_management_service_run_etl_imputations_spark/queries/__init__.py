"""Query catalog: every operator from SURVEY.md §2 (and the engine's
extensions) as a named query over the driver testdata, each paired — where
ANSI-SQL can express it — with a DuckDB oracle for differential testing.

Modules self-register via :func:`register`; :mod:`..catalog` imports them all
and exposes the ``queries()`` / ``oracle_sql()`` driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # include in bench.py's headline set
    # Set when a green CORRECTNESS row is known to predate the code that
    # ships (e.g. an operator rewrite under an unchanged wrapper): forces
    # the query into the driver's verification window ahead of ordinary
    # rotation. Clear the flag once the fresh green row lands.
    reverify: bool = False
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    reverify: bool = False,
):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog.

    ``oracle`` is the equivalent ANSI SQL for DuckDB over the pre-registered
    testdata views; omit it only for genuinely non-SQL-expressible operators
    (the driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, headline, reverify, fn.__doc__ or "")
        return fn

    return deco
