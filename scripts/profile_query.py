"""Profile one or more catalog queries: wall time split into plan-build vs
noop-sink execution, plus the Spark job count each phase submitted (local-mode
jobs cost ~100 ms fixed each, so job count IS the latency model for the
commit-protocol queries whose work happens at plan-build time).

Usage: PYTHONPATH=/root/repo python scripts/profile_query.py <query> [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_management_service_run_etl_imputations_spark import catalog
    from data_management_service_run_etl_imputations_spark.session import get_session

    spark = get_session(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = catalog.queries()

    # warm the JVM once
    reg["flagship_daily_customer_revenue"](spark, sf_dir).limit(1).collect()

    tracker = sc.statusTracker()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    reps = int(os.environ.get("PROFILE_REPS", "3"))
    for name in names:
        for rep in range(reps):
            j0 = job_count()
            t0 = time.perf_counter()
            df = reg[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = job_count()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            j2 = job_count()
            print(
                f"{name} rep{rep}: build={t1-t0:.3f}s ({j1-j0} jobs)  "
                f"exec={t2-t1:.3f}s ({j2-j1} jobs)  total={t2-t0:.3f}s  "
                f"load={os.getloadavg()[0]:.2f}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
