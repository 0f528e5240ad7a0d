"""Machine-sweep plans/r13_audit/: per-plan operator census + red flags.
Writes bench_evidence/r13/plan_audit_summary.txt (same columns as r12)."""
import os, re, sys
d = "/root/repo/plans/r13_audit"
out_lines = []
red = {"batch_eval": [], "failed": [], "cartesian": []}
joins_by = {}
for name in sorted(os.listdir(d)):
    if not name.endswith(".txt"):
        continue
    q = name[:-4]
    text = open(os.path.join(d, name)).read()
    if text.startswith("PLAN DUMP FAILED"):
        red["failed"].append(q)
        continue
    ex = len(re.findall(r"\bExchange (?:hash|range|SinglePartition|rebalance)", text))
    bc = len(re.findall(r"\bBroadcastExchange\b", text))
    joins = sorted(set(re.findall(r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b", text)))
    py = sorted(set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|PythonMapInArrow)\b", text)))
    scans = len(re.findall(r"\bScan (?:parquet|ExistingRDD|csv|json)", text))
    if "BatchEvalPython" in py:
        red["batch_eval"].append(q)
    if "CartesianProduct" in joins:
        red["cartesian"].append(q)
    for j in joins:
        joins_by.setdefault(j, []).append(q)
    out_lines.append(f"{q:46s} {ex:2d} {bc:2d} {'/'.join(joins) or '-':^30s} {'/'.join(py) or '-':^20s} {scans:3d}")
hdr = f"{'query':46s} ex bc {'joins':^30s} {'pythonnodes':^20s} scans"
summary = [hdr] + out_lines + [
    "",
    f"plans: {len(out_lines)}  failed: {len(red['failed'])} {red['failed']}",
    f"BatchEvalPython plans: {len(red['batch_eval'])} {red['batch_eval']}",
    f"CartesianProduct plans: {len(red['cartesian'])} {red['cartesian']}",
    f"SortMergeJoin plans: {len(joins_by.get('SortMergeJoin', []))} {joins_by.get('SortMergeJoin', [])}",
    f"BroadcastNestedLoopJoin plans: {len(joins_by.get('BroadcastNestedLoopJoin', []))} {joins_by.get('BroadcastNestedLoopJoin', [])}",
]
open("/root/repo/bench_evidence/r13/plan_audit_summary.txt", "w").write("\n".join(summary) + "\n")
print("\n".join(summary[-6:]))
