#!/usr/bin/env python3
"""Drop dump-scoped oracle entries (those reading /tmp/graft_oracle —
valid only at the driver's compare SF) from a Verify outDir's
oracle_sql.json, for the other-SF sweeps. Prints what was dropped.

The rewrite is atomic (temp file + os.replace in the same directory):
a crash mid-write must never corrupt the verify artifact."""
import json, os, sys

p = f"{sys.argv[1]}/oracle_sql.json"
with open(p) as f:
    j = json.load(f)
dump = sorted(k for k, v in j.items() if "graft_oracle" in v)
for k in dump:
    del j[k]
tmp = p + ".tmp"
with open(tmp, "w") as f:
    json.dump(j, f)
    f.flush()
    os.fsync(f.fileno())
os.replace(tmp, p)
print(f"stripped {len(dump)} dump-scoped: {dump}")
