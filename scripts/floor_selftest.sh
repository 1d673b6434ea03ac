#!/usr/bin/env bash
# Floor-gate SELF-TEST (r15 verdict item 4): prove the envelope-floor ×
# host-scale stack still catches a real regression, despite its
# deliberate leniency (up to ~3.2x a sub-second floor on a host the
# clamp reads as 1.6x slow).
#
# Three runs over a tiny fast subset (sbt + warmup dominate; the gate
# math is identical at any subset size):
#   1. one query injected 6x slower (run 6 times through the real
#      timing path) on the real host        -> MUST flag it (FAIL)
#   2. same injection + simulated 1.5x-slow host (probe readings
#      scaled; queries real)                -> MUST STILL flag it
#   3. no injection                         -> MUST pass clean
#
# Every run is stamped "selftest":true — freeze_floor.py refuses such
# artifacts, so a self-test can never leak into a floor or a BENCH_r*.
set -euo pipefail
cd "$(dirname "$0")/.."

SUBSET="q_topk,q_tpch_q1,q_distinct"
VICTIM="q_topk"
OUT=target/floor_selftest
mkdir -p "$OUT"

run() { # name, extra env...
  local name=$1; shift
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_ONLY="$SUBSET" \
      SPARK_GRAFT_BENCH_OUT="$OUT/$name.json" \
      "$@" sbt -batch "runMain graft.Bench" > "$OUT/$name.log" 2>&1 || true
}

check() { # name, expect_violation (1|0)
  python3 - "$OUT/$1.json" "$2" "$VICTIM" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
expect, victim = sys.argv[2] == "1", sys.argv[3]
assert d.get("selftest") is True, "self-test artifact must be stamped"
fl = d["floor"]
if not fl["quiet"]:
    sys.exit(f"INCONCLUSIVE: host not quiet during {sys.argv[1]} — rerun")
flagged = victim in fl["violations"]
if flagged != expect:
    sys.exit(f"SELF-TEST FAILED: {sys.argv[1]} expected "
             f"violation={expect}, got violations={fl['violations']} "
             f"(host_scale={fl['host_scale']:.2f})")
print(f"ok: {sys.argv[1]} violation[{victim}]={flagged} "
      f"host_scale={fl['host_scale']:.2f} verdict={fl['verdict']}")
EOF
}

run inject SPARK_GRAFT_BENCH_INJECT_SLOW="$VICTIM:6"
check inject 1
run inject_slowhost SPARK_GRAFT_BENCH_INJECT_SLOW="$VICTIM:6" \
    SPARK_GRAFT_BENCH_SIM_HOST_SCALE=1.5
check inject_slowhost 1
run clean SPARK_GRAFT_BENCH_SIM_HOST_SCALE=1.0
check clean 0
echo "FLOOR SELF-TEST PASS: gate flags an injected 6x regression on a real"
echo "and a simulated-1.5x-slow host, and stays clean without injection."
