#!/usr/bin/env python3
"""Rewrite dump-scoped oracle entries (those reading /tmp/graft_oracle)
in a Verify outDir's oracle_sql.json to point at ANOTHER SF's dumps,
so the 3-SF sweep can oracle-check them instead of stripping them.

Requires the Verify run that produced outDir to have been launched with
SPARK_GRAFT_DUMP_ALL_SF=1 so that SF's dumps exist. Only the
`_sf0.01/` segment inside graft_oracle paths is touched — table names,
constants, and everything else in the SQL are left alone.

Atomic rewrite (temp file + os.replace), same discipline as
strip_dump_scoped.py.

Usage: remap_dump_scoped.py <outDir> <sfName e.g. sf0.1>
"""
import json
import os
import re
import sys
import time

out_dir, sf = sys.argv[1], sys.argv[2]
p = f"{out_dir}/oracle_sql.json"
with open(p) as f:
    j = json.load(f)
pat = re.compile(r"(/tmp/graft_oracle/[A-Za-z0-9_]+)_sf0\.01/")
remapped = []
unrewritten = []
missing = []
stale = []
# Dumps must come from the Verify run that wrote oracle_sql.json: that
# run writes dumps first, then the SQL map at the end, so a dump dir
# older than the SQL file by more than a run's worth of slack is debris
# from an earlier run satisfying the isdir check (r12 advice).
sql_mtime = os.path.getmtime(p)
SLACK_S = 2 * 3600
for k, v in j.items():
    if "graft_oracle" not in v:
        continue
    new = pat.sub(rf"\1_{sf}/", v)
    if new != v:
        j[k] = new
        remapped.append(k)
    elif re.search(rf"/tmp/graft_oracle/[A-Za-z0-9_]+_{re.escape(sf)}/", v):
        # already carries the TARGET SF segment: a re-run on an
        # already-remapped oracle_sql.json (manual retry, resumed sweep)
        # is a no-op, not a failure (r13 advice — the hard-fail made the
        # script non-idempotent). Counted as remapped for the summary;
        # the dump existence/staleness checks below still run on it.
        remapped.append(k)
    else:
        unrewritten.append(k)
    for d in re.findall(r"/tmp/graft_oracle/[A-Za-z0-9_.]+/", new):
        d = d.rstrip("/")
        if not os.path.isdir(d):
            missing.append((k, d))
        elif os.path.getmtime(d) < sql_mtime - SLACK_S:
            stale.append((k, d, sql_mtime - os.path.getmtime(d)))
if unrewritten:
    for k in unrewritten:
        print(f"NOT REWRITTEN (graft_oracle path without _sf0.01/ segment) "
              f"for {k}: {j[k][:200]}", file=sys.stderr)
    sys.exit(1)
if missing or stale:
    for k, d in missing:
        print(f"MISSING DUMP for {k}: {d}", file=sys.stderr)
    for k, d, age in stale:
        print(f"STALE DUMP for {k}: {d} is {age/3600:.1f}h older than "
              f"oracle_sql.json — debris from an earlier run?", file=sys.stderr)
    print("(re-run Verify at this SF with SPARK_GRAFT_DUMP_ALL_SF=1)",
          file=sys.stderr)
    sys.exit(1)
with open(p) as f:
    unchanged = json.load(f) == j
if unchanged:
    # pure no-op re-run: leave the file (and its mtime — the staleness
    # reference for any later run) untouched
    print(f"already remapped to {sf} ({len(remapped)} dump-scoped): no-op")
else:
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(j, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    print(f"remapped {len(sorted(remapped))} dump-scoped to {sf}: {sorted(remapped)}")
