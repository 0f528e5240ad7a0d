from data_management_service_run_etl_imputations_spark.plans.fichajes import (
    build_fichajes,
)
from data_management_service_run_etl_imputations_spark.plans.imputaciones import (
    build_imputaciones,
)

__all__ = ["build_imputaciones", "build_fichajes"]
