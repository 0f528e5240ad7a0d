import time, sys
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table
spark = get_session(app_name="abtq"); spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents"); docs.limit(1).collect()
RX = r"[^A-Za-z0-9 \t\n\r]"
def old(df):
    return df.select("doc_id", F.size(F.regexp_extract_all(F.col("text"), F.lit(RX), 0)).alias("n_punct"))
def new(df):
    return df.select("doc_id", (F.length("text") - F.length(F.regexp_replace(F.col("text"), RX, ""))).cast("int").alias("n_punct"))
a = sorted(map(tuple, old(docs).collect())); b = sorted(map(tuple, new(docs).collect()))
print("parity:", a == b)
for label, fn in [("old",old),("new",new)]*2:
    ts=[]
    for _ in range(4):
        t0=time.perf_counter(); fn(docs).write.mode("overwrite").format("noop").save(); ts.append(time.perf_counter()-t0)
    print(label, "min=%.3f"%min(ts), [round(x,3) for x in ts])
spark.stop()
