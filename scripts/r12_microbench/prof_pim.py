import time, sys, os, tempfile, shutil, uuid
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.plans import build_imputaciones
from data_management_service_run_etl_imputations_spark.plans.fixtures import build_fixture_frames
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import manifest_sql, manifest_sql_register, manifest_sql_unregister
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table, manifest_read
spark = get_session(app_name="profpim")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tr = sc.statusTracker()
def jc(): return len(tr.getJobIdsForGroup(None) or [])
# warm
from data_management_service_run_etl_imputations_spark import catalog
reg = catalog.queries()
reg["flagship_daily_customer_revenue"](spark, "/root/testdata/sf0.1").limit(1).collect()
for rep in range(3):
    marks = []
    def mark(label):
        marks.append((label, time.perf_counter(), jc()))
    mark("start")
    fx = build_fixture_frames(spark)
    out = build_imputaciones(fx["time_entries"], fx["employees"], fx["dim_empleado"],
        fx["dim_empresa"], fx["dim_departamento"], fx["department_assignations"])
    mark("plan_built")
    out = out.localCheckpoint()
    mark("localCheckpoint")
    path = os.path.join(tempfile.gettempdir(), f"prof_pim_{rep}")
    shutil.rmtree(path, ignore_errors=True)
    view = f"pim_{uuid.uuid4().hex[:8]}"; src = f"pims_{uuid.uuid4().hex[:8]}"
    out.createOrReplaceTempView(src)
    manifest_create_table(path, [(f.name, f.dataType.simpleString()) for f in out.schema.fields], "fecha")
    mark("create_table")
    manifest_sql_register(spark, view, path)
    mark("register")
    merge = (f"MERGE INTO {view} t USING {src} s ON t.empleado_id = s.empleado_id AND t.fecha = s.fecha AND t.tarea = s.tarea WHEN NOT MATCHED THEN INSERT *")
    r1 = manifest_sql(spark, merge)
    mark("merge1")
    r2 = manifest_sql(spark, merge)
    mark("merge2")
    manifest_sql_unregister(spark, view)
    spark.catalog.dropTempView(src)
    df = manifest_read(spark, path)
    df.write.mode("overwrite").format("noop").save()
    mark("read_noop")
    prev_t, prev_j = marks[0][1], marks[0][2]
    line = []
    for label, t, j in marks[1:]:
        line.append(f"{label}={t-prev_t:.2f}s/{j-prev_j}j")
        prev_t, prev_j = t, j
    print(f"rep{rep}: " + "  ".join(line))
spark.stop()
