import time, sys, os
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.schemas import load_table, table_row_count
from data_management_service_run_etl_imputations_spark.operators.dedup import (
    shingle_hashes, minhash_signatures, minhash_lsh_candidates, verify_pairs_exact_jaccard)
spark = get_session(app_name="profmh2"); spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()
def jobs(): return len(tracker.getJobIdsForGroup(None) or [])
sf="/root/testdata/sf0.1"
docs = load_table(spark, sf, "documents"); docs.limit(1).collect()
def t(label, fn, reps=3):
    best=None
    for _ in range(reps):
        j0=jobs(); t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0; dj=jobs()-j0
        best = dt if best is None else min(best, dt)
    print(f"{label}: min={best:.3f}s jobs={dj} load={os.getloadavg()[0]:.1f}")
def noop(df): df.write.mode("overwrite").format("noop").save()

# phase 1: shingles alone
t("shingles_noop", lambda: noop(shingle_hashes(docs, "doc_id", "text", k=8, distinct=False)))
# phase 2: signatures on fresh shingles (includes shingle cost)
t("signatures_noop", lambda: noop(minhash_signatures(docs, "doc_id", "text", 32, 8, 42,
    shingle_hashes(docs, "doc_id", "text", k=8, distinct=False).localCheckpoint(eager=False))))
# phase 3: candidates end-to-end
def cands_run():
    sh = shingle_hashes(docs, "doc_id", "text", k=8, distinct=False).localCheckpoint(eager=False)
    noop(minhash_lsh_candidates(docs, "doc_id", "text", 32, 16, 8, shingles=sh))
t("cands_noop", cands_run)
# phase 4: full pipeline (the headline query)
def full_run():
    sh = shingle_hashes(docs, "doc_id", "text", k=8, distinct=False).localCheckpoint(eager=False)
    c = minhash_lsh_candidates(docs, "doc_id", "text", 32, 16, 8, shingles=sh)
    noop(verify_pairs_exact_jaccard(docs, c, "doc_id", "text", k=8, threshold=0.8,
        shingles=sh, corpus_count=table_row_count(sf, "documents")))
t("full_noop", full_run)
spark.stop()
