import time, sys, os, tempfile, shutil
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import ManifestTableDataSource
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table, manifest_insert
spark = get_session(app_name="microw")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
spark.dataSource.register(ManifestTableDataSource)
path = os.path.join(tempfile.gettempdir(), "micro_w_tbl")
shutil.rmtree(path, ignore_errors=True)
manifest_create_table(path, [("a","int"),("b","string")], None)
df = spark.createDataFrame([(i,"x") for i in range(25)], "a int, b string")
df.collect()
def t(label, fn, n=4):
    best=1e9
    for _ in range(n):
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0; best=min(best,dt)
    print(f"{label}: min={dt*1000:.1f}ms best={best*1000:.1f}ms")
t("ds_writer_append", lambda: df.write.format("manifest").option("path", path).mode("append").save())
t("manifest_insert", lambda: manifest_insert(df, path))
t("localCheckpoint25", lambda: spark.createDataFrame([(i,"x") for i in range(25)], "a int, b string").localCheckpoint())
spark.stop()
