import time, sys, os
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F, Window
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table
from data_management_service_run_etl_imputations_spark.operators.text import tokens_col
from data_management_service_run_etl_imputations_spark.operators.dedup import shingle_hashes, MINHASH_PRIME
spark = get_session(app_name="microsh"); spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents"); docs.limit(1).collect()
k=8
def t(label, fn, reps=4):
    best=1e9
    for _ in range(reps):
        t0=time.perf_counter(); fn(); best=min(best, time.perf_counter()-t0)
    print(f"{label}: min={best:.3f}s load={os.getloadavg()[0]:.1f}")
def noop(df): df.write.mode("overwrite").format("noop").save()

# a) tokenize+posexplode+xxhash only (no window)
toks = docs.select(F.col("doc_id").alias("id"), F.posexplode(tokens_col("text")).alias("pos","tok")).select("id","pos",F.xxhash64("tok").alias("th"))
t("a_tokens_explode_hash", lambda: noop(toks))
# b) current shingle_hashes (window + leads)
t("b_current_window", lambda: noop(shingle_hashes(docs, "doc_id", "text", k=8, distinct=False)))
# c) HOF variant: token-hash array per doc, xxhash64 over slices, explode
th_arr = F.transform(tokens_col("text"), lambda tok: F.xxhash64(tok))
n = F.size(th_arr)
starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
hof = docs.select(
    F.col("doc_id").alias("id"),
    F.explode(F.transform(starts, lambda i: F.xxhash64(F.slice(th_arr, i, k)))).alias("h"),
)
t("c_hof_slice_hash", lambda: noop(hof))
# d) HOF variant with same polynomial combine as current (identical h values!)
def poly(i):
    acc = F.lit(0).cast("long")
    for j in range(k):
        weight = pow(31, k - 1 - j, 1 << 30)
        term = F.pmod(F.coalesce(F.element_at(th_arr, i + j), F.lit(0)), F.lit(1 << 30))
        acc = F.pmod(acc + term * F.lit(weight).cast("long"), F.lit(MINHASH_PRIME))
    return acc
hof2 = docs.select(
    F.col("doc_id").alias("id"),
    F.explode(F.transform(starts, poly)).alias("h"),
)
t("d_hof_poly_same_values", lambda: noop(hof2))
# equality check d vs b
cur = set(tuple(r) for r in shingle_hashes(docs, "doc_id", "text", k=8, distinct=True).collect())
new = set(tuple(r) for r in hof2.dropDuplicates(["id","h"]).collect())
print("d equals b (distinct sets):", cur == new, len(cur), len(new))
spark.stop()
