import time, sys, os, tempfile, shutil
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import ManifestTableDataSource
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table
spark = get_session(app_name="microw3")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
spark.dataSource.register(ManifestTableDataSource)
path = os.path.join(tempfile.gettempdir(), "micro_w3_tbl")
shutil.rmtree(path, ignore_errors=True)
manifest_create_table(path, [("a","int"),("b","string")], None)
df = spark.createDataFrame([(i,"x") for i in range(25)], "a int, b string").coalesce(1)
df.collect()
for rep in range(12):
    t0=time.perf_counter()
    df.write.format("manifest").option("path", path).mode("append").save()
    print(f"v{rep+2}: {time.perf_counter()-t0:.3f}s load={os.getloadavg()[0]:.1f}")
spark.stop()
