import time, sys
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table
spark = get_session(app_name="abf"); spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
li, o, c = (load_table(spark, sf, t) for t in ("lineitem","orders","customer"))
li.limit(1).collect()
def old():
    return (li.join(o, li.l_orderkey==o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey==c.c_custkey)
        .groupBy(F.to_date("o_orderdate").alias("fecha"), F.col("c_custkey").alias("customer_key"), F.col("c_name").alias("customer_name"))
        .agg(F.sum(F.col("l_extendedprice")*(1-F.col("l_discount"))).alias("revenue"), F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")))
def new():
    agg = (li.join(o, li.l_orderkey==o.o_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("fecha"), F.col("o_custkey").alias("customer_key"))
        .agg(F.sum(F.col("l_extendedprice")*(1-F.col("l_discount"))).alias("revenue"), F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")))
    return (agg.join(F.broadcast(c), agg.customer_key==c.c_custkey)
        .select("fecha","customer_key", F.col("c_name").alias("customer_name"), "revenue","sum_qty","n_lines"))
a = sorted(map(tuple, old().collect())); b = sorted(map(tuple, (new().select(*[f.name for f in old().schema.fields])).collect()))
print("parity:", a==b, len(a))
for label, fn in [("old",old),("new",new)]*2:
    ts=[]
    for _ in range(4):
        t0=time.perf_counter(); fn().write.mode("overwrite").format("noop").save(); ts.append(time.perf_counter()-t0)
    print(label, "min=%.3f"%min(ts), [round(x,3) for x in ts])
spark.stop()
