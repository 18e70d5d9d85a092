#!/bin/bash
# Interleaved A/B: alternate before-tree and after-tree processes so ambient
# load hits both; compare per-query minima. Usage:
#   tools/ab_compare.sh <reps> <runs-per-rep> <query> [query...]
set -u
REPS=$1; RUNS=$2; shift 2
mkdir -p /tmp/ab
for i in $(seq 1 "$REPS"); do
  python /root/repo/tools/ab_bench.py "${BEFORE_TREE:-/root/repo_before}" "$RUNS" "$@" 2>/dev/null | tail -1 > "/tmp/ab/before_$i.json"
  python /root/repo/tools/ab_bench.py /root/repo "$RUNS" "$@" 2>/dev/null | tail -1 > "/tmp/ab/after_$i.json"
done
python - "$REPS" <<'EOF'
import json, sys
reps = int(sys.argv[1])
def mins(tag):
    out = {}
    for i in range(1, reps + 1):
        d = json.load(open(f"/tmp/ab/{tag}_{i}.json"))
        for k, v in d.items():
            out.setdefault(k, []).extend(v)
    return {k: min(v) for k, v in out.items()}
b, a = mins("before"), mins("after")
for k in b:
    print(f"{k:34s} before_min={b[k]:7.3f}  after_min={a[k]:7.3f}  delta={a[k]-b[k]:+7.3f} ({(a[k]/b[k]-1)*100:+.0f}%)")
EOF
