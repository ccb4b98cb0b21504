#!/usr/bin/env bash
# Scaling-efficiency evidence for BASELINE.json's two-cluster-size criterion:
# the same deterministic build job, same input, at local[8] (N) vs local[32]
# (4N cores). No real cluster exists in this sandbox (BASELINE.md), so
# parallelism level stands in for cluster size. Reports triples/sec at both
# and efficiency = (tp_32 / tp_8) / 4.
#
# Usage: tools/scaling_bench.sh [sfDir] [scale]
#   sfDir  default /root/testdata/sf0.1
#   scale  corpus replication factor (default 16 -> ~1.6M turns) so the job
#          is long enough that per-stage fixed overhead doesn't dominate.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
SCALE=${2:-16}
OUT=$(mktemp -d)
for CPUS in 8 32; do
  echo "== local[$CPUS] scale=$SCALE $SF" >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SCALE=$SCALE \
    SPARK_GRAFT_QUERIES=0 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' \
    > "$OUT/bench_$CPUS.json"
  cat "$OUT/bench_$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
b8 = json.load(open(f"{out}/bench_8.json"))
b32 = json.load(open(f"{out}/bench_32.json"))
tp8, tp32 = b8["triples_per_sec"], b32["triples_per_sec"]
eff = (tp32 / tp8) / 4
print(json.dumps({
    "triples_per_sec_local8": round(tp8, 1),
    "triples_per_sec_local32": round(tp32, 1),
    "build_sec_local8": round(b8["build_sec"], 2),
    "build_sec_local32": round(b32["build_sec"], 2),
    "edges": b8["edges"],
    "scaling_efficiency_8_to_32": round(eff, 3),
}))
EOF
