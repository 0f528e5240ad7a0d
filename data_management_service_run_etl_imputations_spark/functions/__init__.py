from data_management_service_run_etl_imputations_spark.functions.scalars import (
    contains_ci,
    duration_hours,
    fill_nulls,
    parse_date,
    parse_timestamp,
    to_date_str,
)

__all__ = [
    "contains_ci",
    "duration_hours",
    "fill_nulls",
    "parse_date",
    "parse_timestamp",
    "to_date_str",
]
