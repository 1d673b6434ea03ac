#!/bin/bash
# Full 3-SF oracle sweep INCLUDING the dump-scoped keys (r11 verdict
# item 5): each SF's Verify run is launched with SPARK_GRAFT_DUMP_ALL_SF=1
# so OracleDump publishes that SF's dumps, then remap_dump_scoped.py
# points the oracle SQL at them (sf0.01 needs no remap — it's the
# compare SF the static SQL already names).
#
# Usage: sweep_3sf.sh [outRoot]   (default /tmp/graft_sweep)
set -e
OUT=${1:-/tmp/graft_sweep}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for SF in sf0.001 sf0.01 sf0.1; do
  echo "=== $SF ==="
  rm -rf "$OUT/$SF"
  SPARK_GRAFT_DUMP_ALL_SF=1 bash scripts/run_soak.sh graft.Verify 48g \
    "$OUT/verify_$SF.log" "/root/testdata/$SF" "$OUT/$SF"
  if [ "$SF" != "sf0.01" ]; then
    python3 scripts/remap_dump_scoped.py "$OUT/$SF" "$SF"
  fi
  python3 scripts/check_oracle.py "/root/testdata/$SF" "$OUT/$SF" \
    | tail -5
done
