#!/usr/bin/env python3
"""Freeze a bench floor as the per-query MAX of two committed quiet
runs — the r11 envelope policy, reinstated after the r13 single-run
freeze fired 7 false violations on a slow-but-quiet driver host.

Also records `calibration_sec`: the FASTER run's median calibration
probe (before + mid + after). graft.Bench divides the current run's
median probe by it and stretches the 2x violation threshold by the
ratio, clamped to [1.0, 1.6], so uniform host slowdown the probes can
see doesn't trip sub-second floors.

Refuses non-quiet inputs (any probe >= 2 s) and runs with failed
queries: a floor must only ever be frozen from evidence-grade runs.

Usage: freeze_floor.py <open_run.log> <close_run.log> <out_floor.json>
"""
import json
import statistics
import sys


def load_run(path):
    # collect ALL total lines: a log file appended with >> across re-runs
    # holds several, and silently freezing from the FIRST would pin the
    # floor to a stale run. Taking the last is what a re-run means, but
    # multiple runs in one artifact is unusual enough to surface loudly.
    matches = []
    with open(path, errors="ignore") as f:
        for line in f:
            if '"queries"' in line and '"metric":"total"' in line:
                matches.append(json.loads(line[line.index('{"metric"'):]))
    if not matches:
        sys.exit(f"no total-with-queries line found in {path}")
    if len(matches) > 1:
        print(f"WARNING: {path} holds {len(matches)} total lines "
              f"(appended re-runs?) — freezing from the LAST",
              file=sys.stderr)
    d = matches[-1]
    # WARM probes only (matching Bench's r15 quiet definition): the
    # first calibration is JIT-cold and measures the JVM, not the host
    # — it reads 1.5-2.0 s on provably quiet hosts. calibration_sec
    # (the host-scale denominator) must be warm for the same reason.
    probes = [d["calibration"]["after_sec"],
              *d["calibration"].get("mid_sec", [])]
    if any(p >= 2.0 for p in probes):
        sys.exit(f"REFUSED: {path} is not quiet "
                 f"(warm probe >= 2 s in {probes})")
    if d.get("failed"):
        sys.exit(f"REFUSED: {path} has failed queries "
                 f"{d['failed']}")
    if d.get("selftest"):
        sys.exit(f"REFUSED: {path} is a floor-gate SELF-TEST artifact "
                 "(injected slowdown / simulated host) — never a floor source")
    return d["queries"], statistics.median(probes)


open_path, close_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
oq, ocal = load_run(open_path)
cq, ccal = load_run(close_path)
if set(oq) != set(cq):
    only_o = sorted(set(oq) - set(cq))
    only_c = sorted(set(cq) - set(oq))
    sys.exit(f"REFUSED: query sets differ — only in open: {only_o}, "
             f"only in close: {only_c}")
env = {k: max(oq[k], cq[k]) for k in sorted(oq)}
floor = {
    "frozen_from": (f"max({open_path}, {close_path}) — two-run envelope "
                    "(r11 policy, reinstated r14); calibration_sec = "
                    "faster run's median probe for Bench host-scaling"),
    "calibration_sec": min(ocal, ccal),
    "open_median_probe_sec": ocal,
    "close_median_probe_sec": ccal,
    "queries": env,
}
with open(out, "w") as f:
    json.dump(floor, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"froze {len(env)} envelope floors to {out} "
      f"(calibration_sec={min(ocal, ccal):.3f}; "
      f"open median probe {ocal:.3f}, close {ccal:.3f})")
