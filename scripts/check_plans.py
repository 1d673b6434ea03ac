#!/usr/bin/env python3
"""Plan-fingerprint regression gate (r12 verdict item 3).

Compares a Verify run's plan_fingerprints.json against the committed
floor (plans_floor.json). The bench floor catches time creep; this
catches silent PLAN flips that stay inside the time gate — a broadcast
join becoming a shuffle at a data-size boundary, a pushed filter lost
in a refactor, a partial aggregate disappearing.

Verdicts per query:
  - hash matches floor          -> ok
  - hash differs                -> CHANGED (fails; prints a unified diff
                                   of the stored canonical plan text)
  - in floor, missing from run  -> MISSING (fails)
  - in run, not in floor        -> new (reported, does not fail — freeze
                                   deliberately to adopt)

Re-freeze discipline is the bench floor's: adopt plan changes on
purpose with --freeze after reviewing the diffs, never by default.

Usage:
  check_plans.py <runDir>/plan_fingerprints.json [plans_floor.json]
  check_plans.py --freeze <runDir>/plan_fingerprints.json [plans_floor.json]
"""
import difflib
import json
import sys

# Queries whose PLAN TEXT is nondeterministic inside Spark itself (not
# in our query code) — excluded from the compare, with the reason
# pinned here. Keep this list justified and short.
EXCLUDE = {
    # Multiple countDistinct in one aggregate: RewriteDistinctAggregates
    # groups distinct children in hash order of exprIds, which are a
    # process-global counter — the gid<->column assignment permutes
    # between runs (verified: 3 identical-code runs, only this key
    # flips). Results are column-keyed and oracle-stable.
    "q_profile": "multi-countDistinct gid assignment is exprId-hash-ordered",
}

args = [a for a in sys.argv[1:] if a != "--freeze"]
freeze = "--freeze" in sys.argv[1:]
current_path = args[0]
floor_path = args[1] if len(args) > 1 else "plans_floor.json"

with open(current_path) as f:
    current = json.load(f)

if freeze:
    with open(floor_path, "w") as f:
        json.dump(current, f, indent=1, sort_keys=True)
    print(f"froze {len(current)} plan fingerprints to {floor_path}")
    sys.exit(0)

try:
    with open(floor_path) as f:
        floor = json.load(f)
except FileNotFoundError:
    print(f"no floor at {floor_path} — run with --freeze to create one",
          file=sys.stderr)
    sys.exit(1)

changed, missing, new = [], [], []
for k, v in sorted(floor.items()):
    if k in EXCLUDE:
        continue
    if k not in current:
        missing.append(k)
    elif current[k]["hash"] != v["hash"]:
        changed.append(k)
new = sorted(set(current) - set(floor))

for k in changed:
    print(f"CHANGED {k}")
    diff = difflib.unified_diff(
        floor[k]["plan"].splitlines(), current[k]["plan"].splitlines(),
        lineterm="", fromfile=f"floor/{k}", tofile=f"run/{k}")
    for line in list(diff)[:80]:
        print("  " + line)
for k in missing:
    print(f"MISSING {k} (in floor, absent from this run)")
for k in new:
    print(f"new {k} (not yet frozen)")

n_excl = sum(1 for k in floor if k in EXCLUDE)
n_ok = len(floor) - len(changed) - len(missing) - n_excl
print(f"{n_ok} ok, {len(changed)} changed, {len(missing)} missing, "
      f"{len(new)} new, {n_excl} excluded "
      f"(floor {len(floor)}, run {len(current)})")
sys.exit(1 if (changed or missing) else 0)
