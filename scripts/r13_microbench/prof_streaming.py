"""Per-stage breakdown of streaming_tumbling_agg from Spark's own
StreamingQueryProgress: durationMs phases + state-operator metrics —
the principled evidence for the micro-batch machinery floor (SCALE.md)."""
import json, sys, time, os
sys.path.insert(0,'/root/repo')
from data_management_service_run_etl_imputations_spark.session import get_session
from data_management_service_run_etl_imputations_spark.streaming.events import (
    read_events_stream, tumbling_window_agg, ensure_streaming_confs)
spark = get_session(app_name="profstream"); spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
for rep in range(3):
    t0=time.perf_counter()
    stream = read_events_stream(spark, sf)
    agg = tumbling_window_agg(stream, "1 hour")
    ensure_streaming_confs(spark)
    q = (agg.writeStream.format("memory").queryName(f"ps_{rep}")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    wall=time.perf_counter()-t0
    print(f"rep{rep} wall={wall:.2f}s load={os.getloadavg()[0]:.1f}")
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
        pj = p if isinstance(p, dict) else json.loads(p.json)
        so = pj.get("stateOperators", [])
        print("  batch", pj.get("batchId"), "durationMs:", d)
        for s in so:
            print("    state:", {k: s.get(k) for k in ("numRowsTotal","numRowsUpdated","commitTimeMs","stateMemory","numStateStoreInstances") if k in s})
spark.stop()
