"""Sub-pipeline B — fichajes (clock-in/out daily balances).

Recomposition of ``function_app.py:318-388`` (SURVEY §3.3): per-day seconds
sums → left joins to employees / empleado map / latest department → fuzzy
company & department lookups → canonical select/rename/casts.

Unlike pipeline A, every join here is LEFT (the reference keeps employees
missing from Dim_Empleado, ``function_app.py:332``), and the dead
``secondsBalance`` aggregate (``:325`` computed, ``:348`` discarded) is not
reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.aggregates import (
    dedup_keep_last,
    latest_per_key,
)
from data_management_service_run_etl_imputations_spark.operators.joins import (
    fuzzy_containment_lookup,
)


def build_fichajes(
    worked_hours: DataFrame,
    employees: DataFrame,
    dim_empleado: DataFrame,
    dim_empresa: DataFrame,
    dim_departamento: DataFrame,
    department_assignations: DataFrame,
) -> DataFrame:
    """worked_hours → Fact_Fichajes rows (grain: fecha, empleado_id-or-null).

    Returns columns: fecha, tiempo_teorico, tiempo_trabajado, empresa_id,
    departamento_id, empleado_id (function_app.py:348-365).
    """
    # A4 — daily seconds sums per employee (function_app.py:322-326)
    daily = worked_hours.groupBy("employeeId", "date").agg(
        F.sum("secondsWorked").alias("tiempo_trabajado"),
        F.sum("secondsToWork").alias("tiempo_teorico"),
    )

    # J7 — left join employees for company_name + nid (function_app.py:329)
    emp = employees.select("id", "company_name", "nid")
    fact = daily.join(F.broadcast(emp), daily.employeeId == emp.id, "left").drop("id")

    # J8 — LEFT join to the deduped empleado map (function_app.py:332 —
    # left here, unlike pipeline A's inner J4)
    empleado_map = dedup_keep_last(
        dim_empleado.select("DNI", "empleado_id"), ["DNI"], [F.desc("empleado_id")]
    )
    fact = fact.join(
        F.broadcast(empleado_map), fact.nid == empleado_map.DNI, "left"
    ).drop("DNI")

    # J6 — fuzzy company lookup (function_app.py:335)
    fact = fact.withColumn("__row", F.monotonically_increasing_id())
    fact = fuzzy_containment_lookup(
        fact, dim_empresa, "company_name", "nombre", "empresa_id", "empresa_id",
        fact_key="__row",
    )

    # A2 + J9 — latest department per employee, left join (function_app.py:338)
    latest_dept = latest_per_key(
        department_assignations.select("employee_id", "department_name", "updated_at"),
        ["employee_id"],
        [F.desc("updated_at"), F.desc("department_name")],
        keep=["employee_id", "department_name"],
    ).withColumnRenamed("employee_id", "__dept_emp")
    fact = fact.join(
        F.broadcast(latest_dept), fact.employeeId == F.col("__dept_emp"), "left"
    ).drop("__dept_emp")

    # F8 — unmatched departments become "No asignado" BEFORE the fuzzy
    # lookup (function_app.py:341), so they fuzzy-match nothing → null id.
    fact = fact.na.fill({"department_name": "No asignado"})

    # J6 — fuzzy department lookup (function_app.py:345)
    fact = fuzzy_containment_lookup(
        fact, dim_departamento, "department_name", "nombre", "departamento_id",
        "departamento_id", fact_key="__row",
    ).drop("department_name", "__row")

    # P1/P5/F10 — select, rename, explicit double casts
    # (function_app.py:348-360)
    return fact.select(
        F.col("date").alias("fecha"),
        F.col("tiempo_teorico").cast("double").alias("tiempo_teorico"),
        F.col("tiempo_trabajado").cast("double").alias("tiempo_trabajado"),
        "empresa_id",
        "departamento_id",
        "empleado_id",
    )
