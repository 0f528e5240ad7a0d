import sys, os, time, json
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark import catalog
from data_management_service_run_etl_imputations_spark.session import get_session
spark = get_session(app_name="pimjobs"); spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
reg = catalog.queries()
sf="/root/testdata/sf0.1"
reg["flagship_daily_customer_revenue"](spark, sf).limit(1).collect()
# warm rep
reg["pipeline_imputaciones_manifest"](spark, sf).write.mode("overwrite").format("noop").save()
tracker = sc.statusTracker()
j0 = tracker.getJobIdsForGroup(None) or []
t0=time.perf_counter()
reg["pipeline_imputaciones_manifest"](spark, sf).write.mode("overwrite").format("noop").save()
wall=time.perf_counter()-t0
j1 = tracker.getJobIdsForGroup(None) or []
new = sorted(set(j1)-set(j0))
print(f"wall={wall:.2f}s jobs={len(new)}")
store = sc._jsc.sc().statusStore()
for jid in new:
    try:
        jd = store.job(jid)
        name = jd.name() if hasattr(jd, 'name') else ""
        # description lives in properties; fall back to name
        print(jid, jd.status().toString(), name[:110])
    except Exception as e:
        print(jid, "?", e)
spark.stop()
