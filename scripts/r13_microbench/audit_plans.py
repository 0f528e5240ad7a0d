"""Dump explain(formatted) for EVERY catalog query to plans/r13_audit/ (audit
artifacts, committed only as the summary in OPTIMIZATION_r12.md)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from data_management_service_run_etl_imputations_spark import catalog
from data_management_service_run_etl_imputations_spark.session import get_session
spark = get_session(app_name="plan-audit")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
out_dir = "/root/repo/plans/r13_audit"
reg = catalog.queries()
for i, (name, fn) in enumerate(reg.items()):
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as exc:
        plan = f"PLAN DUMP FAILED: {exc!r}\n"
    with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
        fh.write(plan)
    print(f"[{i+1}] {name} {time.perf_counter()-t0:.1f}s", flush=True)
spark.stop()
