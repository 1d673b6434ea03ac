#!/usr/bin/env python3
"""Drop dump-scoped oracle entries (those reading /tmp/graft_oracle —
valid only at the driver's compare SF) from a Verify outDir's
oracle_sql.json, for the other-SF sweeps. Prints what was dropped."""
import json, sys
p = f"{sys.argv[1]}/oracle_sql.json"
j = json.load(open(p))
dump = sorted(k for k, v in j.items() if "graft_oracle" in v)
for k in dump:
    del j[k]
json.dump(j, open(p, "w"))
print(f"stripped {len(dump)} dump-scoped: {dump}")
