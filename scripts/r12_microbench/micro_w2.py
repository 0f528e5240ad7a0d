import time, sys, os, tempfile, shutil
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.sources.manifest_batch import ManifestTableDataSource
from data_management_service_run_etl_imputations_spark.sources.sinks import manifest_create_table
spark = get_session(app_name="microw2")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
spark.dataSource.register(ManifestTableDataSource)
sc = spark.sparkContext
tr = sc.statusTracker()
def jc(): return len(tr.getJobIdsForGroup(None) or [])
path = os.path.join(tempfile.gettempdir(), "micro_w2_tbl")
shutil.rmtree(path, ignore_errors=True)
manifest_create_table(path, [("a","int"),("b","string")], None)
df = spark.createDataFrame([(i,"x") for i in range(25)], "a int, b string")
print("df partitions:", df.rdd.getNumPartitions())
df.collect()
for rep in range(4):
    j0=jc(); t0=time.perf_counter()
    df.write.format("manifest").option("path", path).mode("append").save()
    print(f"rep{rep}: {time.perf_counter()-t0:.3f}s jobs={jc()-j0}")
# single-partition source
df1 = df.coalesce(1)
for rep in range(2):
    j0=jc(); t0=time.perf_counter()
    df1.write.format("manifest").option("path", path).mode("append").save()
    print(f"coalesced rep{rep}: {time.perf_counter()-t0:.3f}s jobs={jc()-j0}")
spark.stop()
