from data_management_service_run_etl_imputations_spark.operators.aggregates import (
    dedup_keep_last,
    latest_per_key,
)
from data_management_service_run_etl_imputations_spark.operators.joins import (
    fuzzy_containment_lookup,
)

__all__ = [
    "dedup_keep_last",
    "latest_per_key",
    "fuzzy_containment_lookup",
]
