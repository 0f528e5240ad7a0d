import time, sys, os
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F, Window
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table
from data_management_service_run_etl_imputations_spark.operators.text import tokens_col
from data_management_service_run_etl_imputations_spark.operators.dedup import shingle_hashes, MINHASH_PRIME
spark = get_session(app_name="microsh2"); spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents"); docs.limit(1).collect()
k=8
def t(label, fn, reps=5):
    best=1e9; xs=[]
    for _ in range(reps):
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0; xs.append(round(dt,3)); best=min(best,dt)
    print(f"{label}: min={best:.3f}s {xs} load={os.getloadavg()[0]:.1f}")
def noop(df): df.write.mode("overwrite").format("noop").save()
toks = docs.select(F.col("doc_id").alias("id"), F.posexplode(tokens_col("text")).alias("pos","tok")).select("id","pos",F.xxhash64("tok").alias("th"))
t("a_explode_hash", lambda: noop(toks))
w = Window.partitionBy("id").orderBy("pos")
# b1: exchange+sort only (row_number to force window machinery, 1 expr)
t("b1_window_1expr", lambda: noop(toks.withColumn("r", F.row_number().over(w))))
# b2: 8 leads
comb = F.lit(0).cast("long")
for i in range(k):
    weight = pow(31, k - 1 - i, 1 << 30)
    term = F.pmod(F.coalesce(F.lead("th", i).over(w), F.lit(0)), F.lit(1 << 30))
    comb = F.pmod(comb + term * F.lit(weight).cast("long"), F.lit(MINHASH_PRIME))
t("b2_window_8leads", lambda: noop(toks.withColumn("h", comb)))
# b3: full current operator
t("b3_full_current", lambda: noop(shingle_hashes(docs, "doc_id", "text", k=8, distinct=False)))
spark.stop()
