"""End-to-end parity tests for sub-pipelines A (imputaciones) and B
(fichajes) over FIXTURES.md-shaped synthetic inputs, exercising every
generator constraint (FIXTURES.md §'Generator constraints'):

1. fuzzy containment incl. case variation and no-match → null empresa_id
2. duplicate DNI in dim_empleado → keep-last dedup
3. multiple department assignations → keep-latest by updated_at
4. nulls in comment/tags → fillna; employee missing from dim_empleado →
   dropped in A (inner), kept in B (left)
5. multiple entries per (employee, date, comment) → summed; cross-midnight
   durations
6. incremental re-run appends zero rows
"""

from __future__ import annotations

import pytest

from data_management_service_run_etl_imputations_spark.plans import (
    build_fichajes,
    build_imputaciones,
)
from data_management_service_run_etl_imputations_spark.plans.fixtures import (
    build_fixture_frames,
)
from data_management_service_run_etl_imputations_spark.sources.sinks import (
    incremental_insert_only,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    # Shared deterministic fixtures (plans/fixtures.py) — the same rows the
    # catalog's pipeline-parity oracles inline as SQL VALUES.
    return build_fixture_frames(spark)


@pytest.fixture(scope="module")
def imputaciones(spark, fixtures):
    df = build_imputaciones(
        fixtures["time_entries"],
        fixtures["employees"],
        fixtures["dim_empleado"],
        fixtures["dim_empresa"],
        fixtures["dim_departamento"],
        fixtures["department_assignations"],
    )
    return df.collect()


def test_imputaciones_grain_and_membership(imputaciones):
    keys = [(r.empleado_id, str(r.fecha), r.tarea) for r in imputaciones]
    assert len(keys) == len(set(keys))
    # E3 (missing from dim_empleado) dropped by the inner join (J4)
    assert {r.empleado_id for r in imputaciones} == {11, 22}


def test_imputaciones_sum_and_duration(imputaciones):
    by_key = {(r.empleado_id, str(r.fecha), r.tarea): r for r in imputaciones}
    # two taskA entries summed: 2h + 1h
    assert by_key[(11, "2024-03-01", "taskA")].horas_imputadas == pytest.approx(3.0)
    # cross-midnight 23:30→01:00 = 1.5h, null comment → tarea "", fecha = in-date
    r = by_key[(11, "2024-03-01", "")]
    assert r.horas_imputadas == pytest.approx(1.5)
    assert r.etiqueta == "No especificada"  # null tags filled
    assert by_key[(22, "2024-03-01", "taskB")].horas_imputadas == pytest.approx(8.0)


def test_imputaciones_fuzzy_and_latest_dept(imputaciones):
    by_emp = {r.empleado_id: r for r in imputaciones}
    # 'ACME HOLDINGS S.L.' contains both 'acme holdings' (id 1) and 'acme'
    # (id 2) → first dim row wins (reference row-order semantics)
    assert by_emp[11].empresa_id == 1
    assert by_emp[22].empresa_id == 3
    # E1's latest assignment (2024-02-15) is 'Data & Analytics' → 'data' → 200
    assert by_emp[11].departamento_id == 200
    assert by_emp[22].departamento_id == 100
    assert by_emp[11].precio_hora == 50.0


@pytest.fixture(scope="module")
def fichajes(spark, fixtures):
    df = build_fichajes(
        fixtures["worked_hours"],
        fixtures["employees"],
        fixtures["dim_empleado"],
        fixtures["dim_empresa"],
        fixtures["dim_departamento"],
        fixtures["department_assignations"],
    )
    return df.collect()


def test_fichajes_sums_and_left_join_keep(fichajes):
    assert len(fichajes) == 3  # E1, E2, E3 (all kept — left joins)
    by_emp = {r.empleado_id: r for r in fichajes}
    # E1: two rows summed
    assert by_emp[11].tiempo_trabajado == pytest.approx(10800.0)
    assert by_emp[11].tiempo_teorico == pytest.approx(28800.0)
    # E3 missing from dim_empleado → null empleado_id but row kept
    assert None in by_emp
    r3 = by_emp[None]
    assert r3.tiempo_trabajado == pytest.approx(14400.0)
    assert r3.empresa_id is None          # 'Initech Unknown' matches nothing
    assert r3.departamento_id is None     # 'No asignado' matches nothing


def test_fichajes_fuzzy_and_types(fichajes):
    by_emp = {r.empleado_id: r for r in fichajes}
    assert by_emp[11].empresa_id == 1
    assert by_emp[22].empresa_id == 3
    assert by_emp[22].departamento_id == 100
    assert isinstance(by_emp[11].tiempo_trabajado, float)
    assert by_emp[11].fecha == "2024-03-01"


def test_incremental_rerun_appends_zero(spark, fixtures, tmp_path_factory):
    """FIXTURES constraint 6 / SURVEY §5 item 3 — both fact sinks are
    idempotent under re-run (reference anti-join, function_app.py:305-312,
    378-385)."""
    path = str(tmp_path_factory.mktemp("facts") / "fact_imputaciones")
    fact = build_imputaciones(
        fixtures["time_entries"], fixtures["employees"], fixtures["dim_empleado"],
        fixtures["dim_empresa"], fixtures["dim_departamento"],
        fixtures["department_assignations"],
    )
    keys = ["empleado_id", "fecha", "tarea"]
    n1 = incremental_insert_only(fact, path, keys)
    assert n1 == fact.count() and n1 > 0
    assert incremental_insert_only(fact, path, keys) == 0  # idempotent
    assert spark.read.parquet(path).count() == n1


def test_run_etl_end_to_end_and_rerun(spark, fixtures, tmp_path_factory):
    """The CLI runner's core: full window ETL, both facts loaded, re-run
    appends zero (reference entry-point semantics, function_app.py:23-53)."""
    from data_management_service_run_etl_imputations_spark.plans.run import (
        run_etl,
        validate_date,
    )

    base = tmp_path_factory.mktemp("etl")
    input_dir, output_dir = str(base / "in"), str(base / "out")
    import os

    os.makedirs(input_dir)
    for name, df in fixtures.items():
        df.write.parquet(f"{input_dir}/{name}.parquet")

    counts = run_etl(spark, input_dir, output_dir, "2024-03-01", "2024-03-31")
    assert counts["fact_imputaciones"] > 0 and counts["fact_fichajes"] > 0
    again = run_etl(spark, input_dir, output_dir, "2024-03-01", "2024-03-31")
    assert again == {"fact_imputaciones": 0, "fact_fichajes": 0}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_date("03/01/2024")
