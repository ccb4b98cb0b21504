#!/usr/bin/env bash
# Self-run correctness gate: graft.Verify + tools/compare.py at two scale
# factors, summarized into VERIFY_SUMMARY_r${ROUND}.txt at the repo root.
# Committed each round so an external-run (driver-side) failure can never
# silently zero the round's correctness signal — the repo carries its own
# attested result.
#
# Usage: tools/verify_all.sh [round] [sf...]
#   round  suffix for the summary file (default 4)
#   sf     scale-factor dirs (default sf0.001 sf0.01)
set -uo pipefail
cd "$(dirname "$0")/.."
ROUND=${1:-4}
shift || true
SFS=("$@")
if [ ${#SFS[@]} -eq 0 ]; then SFS=(sf0.001 sf0.01); fi
SUMMARY="VERIFY_SUMMARY_r${ROUND}.txt"
{
  echo "verify_all round=$ROUND date=$(date -u +%FT%TZ) commit=$(git rev-parse --short HEAD 2>/dev/null || echo '?')"
} > "$SUMMARY"
FAILED=0
for SF in "${SFS[@]}"; do
  SFDIR="/root/testdata/$SF"
  OUT=$(mktemp -d /tmp/verify_${SF}_XXXX)
  echo "== $SF -> $OUT" >&2
  sbt -batch "runMain graft.Verify $SFDIR $OUT" 2>&1 | grep -a '\[verify\]' \
    > "$OUT/verify.log" || FAILED=1
  python3 tools/compare.py "$SFDIR" "$OUT" > "$OUT/compare.log" 2>&1 \
    || FAILED=1
  {
    echo "--- $SF"
    grep -a '\[verify\] done' "$OUT/verify.log" || echo "verify: NO DONE LINE"
    grep -acE '^(FAIL|WEAK)' "$OUT/compare.log" | sed 's/^/fail+weak lines: /'
    tail -3 "$OUT/compare.log"
  } >> "$SUMMARY"
done
cat "$SUMMARY"
exit $FAILED
