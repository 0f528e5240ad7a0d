import time, sys
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table
spark = get_session(app_name="abj6"); spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")
docs.limit(1).collect()
rows = [(10,"spark",1),(20,"window",2),(30,"vector",3),(40,"customer",4),(50,"zzznever",5)]
def old(df):
    lowered = F.lower(F.col("text"))
    cands = F.array(*[F.when(F.instr(lowered, F.lit(t))>0, F.struct(F.lit(o).alias("o"), F.lit(i).cast("int").alias("i"))) for i,t,o in rows])
    return df.withColumn("keyword_id", F.array_min(F.array_compact(cands))["i"]).select("doc_id","keyword_id")
def new(df):
    br = [F.when(F.instr(F.col("__l"), F.lit(t))>0, F.lit(i).cast("int")) for i,t,o in sorted(rows,key=lambda r:(r[2],r[0]))]
    br.append(F.lit(None).cast("int"))
    return df.withColumn("__l", F.lower(F.col("text"))).withColumn("keyword_id", F.coalesce(*br)).drop("__l").select("doc_id","keyword_id")
# parity
a = sorted(map(tuple, old(docs).collect())); b = sorted(map(tuple, new(docs).collect()))
print("parity:", a==b)
import statistics
for label, fn in [("old",old),("new",new)]*2:
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); fn(docs).write.mode("overwrite").format("noop").save(); ts.append(time.perf_counter()-t0)
    print(label, "min=%.3f"%min(ts), [round(x,3) for x in ts])
spark.stop()
