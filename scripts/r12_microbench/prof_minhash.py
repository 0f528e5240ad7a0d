import time, sys, os
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table, table_row_count
from data_management_service_run_etl_imputations_spark.operators.dedup import (
    shingle_hashes, minhash_lsh_candidates, verify_pairs_exact_jaccard)
spark = get_session(app_name="profmh"); spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents"); docs.limit(1).collect()
for rep in range(3):
    t0=time.perf_counter()
    sh_all = shingle_hashes(docs, "doc_id", "text", k=8, distinct=False).localCheckpoint(eager=False)
    sh_all.write.mode("overwrite").format("noop").save()
    t1=time.perf_counter()
    cands = minhash_lsh_candidates(docs, "doc_id", "text", num_perm=32, bands=16, k=8, shingles=sh_all)
    cands.write.mode("overwrite").format("noop").save()
    t2=time.perf_counter()
    out = verify_pairs_exact_jaccard(docs, cands, "doc_id", "text", k=8, threshold=0.8, shingles=sh_all, corpus_count=table_row_count(sf, "documents"))
    out.write.mode("overwrite").format("noop").save()
    t3=time.perf_counter()
    print(f"rep{rep}: shingles={t1-t0:.2f}s cands(+sh)={t2-t1:.2f}s verify={t3-t2:.2f}s load={os.getloadavg()[0]:.1f}")
spark.stop()
