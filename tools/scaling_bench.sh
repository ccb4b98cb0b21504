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
N=${3:-8}
N4=${4:-32}
OUT=$(mktemp -d)
for CPUS in $N $N4; do
  echo "== local[$CPUS] scale=$SCALE $SF" >&2
  # per-core heap (1.5g/core): a 4N-executor cluster brings 4x aggregate
  # memory with it; a shared fixed heap would make the N-core leg
  # artificially memory-rich and the comparison meaningless
  MEM=${5:-$((CPUS * 3 / 2))}
  if [ "$MEM" -gt 24 ]; then MEM=24; fi
  if [ "$MEM" -lt 8 ]; then MEM=8; fi
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SCALE=$SCALE \
    SPARK_GRAFT_QUERIES=0 SPARK_DRIVER_MEM=${MEM}g \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' \
    > "$OUT/bench_$CPUS.json"
  cat "$OUT/bench_$CPUS.json"
done
python3 - "$OUT" "$N" "$N4" <<'EOF'
import json, sys
out, n, n4 = sys.argv[1], sys.argv[2], sys.argv[3]
bn = json.load(open(f"{out}/bench_{n}.json"))
bn4 = json.load(open(f"{out}/bench_{n4}.json"))
tpn, tpn4 = bn["triples_per_sec"], bn4["triples_per_sec"]
eff = (tpn4 / tpn) / (int(n4) / int(n))
print(json.dumps({
    f"triples_per_sec_local{n}": round(tpn, 1),
    f"triples_per_sec_local{n4}": round(tpn4, 1),
    f"build_sec_local{n}": round(bn["build_sec"], 2),
    f"build_sec_local{n4}": round(bn4["build_sec"], 2),
    "edges": bn["edges"],
    f"scaling_efficiency_{n}_to_{n4}": round(eff, 3),
}))
EOF
