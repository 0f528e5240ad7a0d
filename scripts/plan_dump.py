"""Dump .explain("formatted") for catalog queries to plans/$PLAN_ROUND (default r13)/<name>_<tag>.txt.

Usage: PYTHONPATH=/root/repo python scripts/plan_dump.py <tag> [query ...]
  tag: suffix (e.g. "before" / "after")
  query: names to dump; default = all headline queries.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the bench scale —
so Exchange counts / join strategies / PushedFilters match what the bench
measures. Queries with commit side effects (manifest pipeline, lifecycle)
still run their plan-time work; their dumped plan is the RETURNED frame's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_management_service_run_etl_imputations_spark import catalog
    from data_management_service_run_etl_imputations_spark.session import get_session

    spark = get_session(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    reg = catalog.queries()
    if not names:
        names = list(catalog.headline_queries())
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLAN_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"plan_dump:{name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in-place
            plan = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
