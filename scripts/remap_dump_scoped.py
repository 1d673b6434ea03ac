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

out_dir, sf = sys.argv[1], sys.argv[2]
p = f"{out_dir}/oracle_sql.json"
with open(p) as f:
    j = json.load(f)
pat = re.compile(r"(/tmp/graft_oracle/[A-Za-z0-9_]+)_sf0\.01/")
remapped = []
missing = []
for k, v in j.items():
    if "graft_oracle" not in v:
        continue
    new = pat.sub(rf"\1_{sf}/", v)
    j[k] = new
    remapped.append(k)
    for d in re.findall(r"/tmp/graft_oracle/[A-Za-z0-9_.]+/", new):
        if not os.path.isdir(d.rstrip("/")):
            missing.append((k, d))
if missing:
    for k, d in missing:
        print(f"MISSING DUMP for {k}: {d}", file=sys.stderr)
    print("(re-run Verify at this SF with SPARK_GRAFT_DUMP_ALL_SF=1)",
          file=sys.stderr)
    sys.exit(1)
tmp = p + ".tmp"
with open(tmp, "w") as f:
    json.dump(j, f)
    f.flush()
    os.fsync(f.fileno())
os.replace(tmp, p)
print(f"remapped {len(sorted(remapped))} dump-scoped to {sf}: {sorted(remapped)}")
