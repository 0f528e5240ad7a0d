"""Materialized query catalog — the driver contract's backing store.

Importing this module imports every query module (which self-register into
``queries.REGISTRY``) and exposes plain-dict views used by
``__spark_entry__.py`` and ``bench.py``.
"""

from __future__ import annotations

import importlib

from data_management_service_run_etl_imputations_spark.queries import REGISTRY, Query, QueryFn

_QUERY_MODULES = [
    "core",
    "relational",
    "functions_q",
    "pipelines_q",
    "text_q",
    "dedup_q",
    "similarity_q",
    "imputation_q",
    "multimodal_q",
    "streaming_q",
    "advanced_q",
    "breadth_q",
    "tpch_q",
    "sources_q",
]

for _m in _QUERY_MODULES:
    importlib.import_module(f"data_management_service_run_etl_imputations_spark.queries.{_m}")


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle.strip() for name, q in REGISTRY.items() if q.oracle}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in REGISTRY.items() if q.headline}
