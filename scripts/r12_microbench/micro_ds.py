import time, sys
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import ManifestTableDataSource
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table, manifest_insert
spark = get_session(app_name="micro")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
import tempfile, os, shutil
path = os.path.join(tempfile.gettempdir(), "micro_ds_tbl")
shutil.rmtree(path, ignore_errors=True)
manifest_create_table(path, [("a","int"),("b","string")], None)
manifest_insert(spark.createDataFrame([(1,"x"),(2,"y")], "a int, b string"), path)

def t(label, fn, n=5):
    best=1e9
    for _ in range(n):
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0; best=min(best,dt)
    print(f"{label}: min={best*1000:.1f}ms")

t("dataSource.register", lambda: spark.dataSource.register(ManifestTableDataSource))
t("load()", lambda: spark.read.format("manifest").option("path", path).load())
sch = spark.read.format("manifest").option("path", path).load().schema
t("load(schema=...)", lambda: spark.read.format("manifest").option("path", path).schema(sch).load())
df = spark.read.format("manifest").option("path", path).load()
t("createOrReplaceTempView", lambda: df.createOrReplaceTempView("micro_v"))
t("collect_after_load", lambda: spark.read.format("manifest").option("path", path).load().collect(), n=3)
t("collect_after_load_schema", lambda: spark.read.format("manifest").option("path", path).schema(sch).load().collect(), n=3)
spark.stop()
