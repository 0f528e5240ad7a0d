"""PySpark-native analytics engine with the query/data-processing surface of
``egarofalo-salasplus/data-management-service-run-etl-imputations``.

The reference (``/root/reference/function_app.py``) is a single-threaded pandas
ETL; this package re-expresses every operator it uses (SURVEY.md §2) as lazy,
Catalyst-optimizable DataFrame transformations designed for 100 TB scale, and
extends the surface with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, ML imputation, streaming).
"""

from data_management_service_run_etl_imputations_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
