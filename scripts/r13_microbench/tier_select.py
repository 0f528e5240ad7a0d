"""From a pytest --durations=0 log, aggregate per-FILE total duration and
propose the slow-marked set: greedily mark the heaviest files until the
remaining ("not slow") tier fits the budget (default 12 min of test time,
leaving headroom to the 15-min driver window)."""
import re, sys, collections
log = sys.argv[1]
budget = float(sys.argv[2]) if len(sys.argv) > 2 else 720.0
per_file = collections.Counter()
per_file_n = collections.Counter()
pat = re.compile(r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(tests/[^:]+)::")
for line in open(log):
    m = pat.match(line)
    if m:
        per_file[m.group(3)] += float(m.group(1))
        per_file_n[m.group(3)] += 1
total = sum(per_file.values())
print(f"files={len(per_file)} total_test_time={total:.0f}s")
ranked = per_file.most_common()
slow, kept = [], []
remaining = total
for f, t in ranked:
    if remaining > budget:
        slow.append((f, t)); remaining -= t
    else:
        kept.append((f, t))
print(f"\nslow tier ({len(slow)} files, {total-remaining:.0f}s marked; fast tier ~{remaining:.0f}s):")
for f, t in slow: print(f"  {t:8.1f}s {f}")
print(f"\nfast tier ({len(kept)} files):")
for f, t in sorted(kept, key=lambda x: -x[1]): print(f"  {t:8.1f}s {f}")
