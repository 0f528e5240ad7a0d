import time, sys, os, tempfile, shutil
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import ManifestTableDataSource
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table, manifest_insert
spark = get_session(app_name="microw4")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
spark.dataSource.register(ManifestTableDataSource)
sc = spark.sparkContext; tr = sc.statusTracker()
def jc(): return len(tr.getJobIdsForGroup(None) or [])
df = spark.sql("SELECT * FROM VALUES " + ",".join(f"({i}, 'x')" for i in range(25)) + " AS t(a, b)")
df.collect()
def run(label, fn, n=5):
    res=[]
    for i in range(n):
        path = os.path.join(tempfile.gettempdir(), f"mw4_{label}_{i}")
        shutil.rmtree(path, ignore_errors=True)
        manifest_create_table(path, [("a","int"),("b","string")], None)
        j0=jc(); t0=time.perf_counter()
        fn(path)
        res.append((time.perf_counter()-t0, jc()-j0))
    print(label, " ".join(f"{t:.2f}s/{j}j" for t,j in res))
run("ds_writer", lambda p: df.write.format("manifest").option("path", p).mode("append").save())
run("manifest_insert", lambda p: manifest_insert(df, p))
run("plain_parquet", lambda p: df.write.mode("overwrite").parquet(p + "_plain"))
spark.stop()
