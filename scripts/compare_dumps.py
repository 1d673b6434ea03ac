#!/usr/bin/env python3
"""Cross-run determinism compare: two Verify output dirs must contain
value-identical query dumps (row content, column names; row/file order
free). Used for the local[4]-vs-local[32] cross-parallelism check.

Usage: python3 scripts/compare_dumps.py <outDirA> <outDirB>
"""
import os
import sys

import duckdb


def main(a, b):
    names_a = {n for n in os.listdir(a) if n.startswith("q_")}
    names_b = {n for n in os.listdir(b) if n.startswith("q_")}
    if names_a != names_b:
        print(f"DUMP SETS DIFFER: only-A={sorted(names_a - names_b)} "
              f"only-B={sorted(names_b - names_a)}")
        sys.exit(1)
    con = duckdb.connect()
    n_same = n_diff = 0
    for name in sorted(names_a):
        try:
            da = con.execute(
                f"SELECT * FROM '{a}/{name}/*.parquet'").fetchdf()
            db = con.execute(
                f"SELECT * FROM '{b}/{name}/*.parquet'").fetchdf()
            cols = sorted(da.columns)
            if sorted(db.columns) != cols:
                print(f"DIFF {name}: columns {sorted(da.columns)} vs {sorted(db.columns)}")
                n_diff += 1
                continue
            if len(da) == 0 or len(db) == 0:
                # apply(axis=1) on 0 rows yields a DataFrame, not a
                # Series — compare emptiness directly
                if len(da) == len(db):
                    n_same += 1
                else:
                    print(f"DIFF {name}: {len(da)} vs {len(db)} rows")
                    n_diff += 1
                continue
            sa = da[cols].astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values()
            sb = db[cols].astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values()
            if len(sa) != len(sb) or not (sa.values == sb.values).all():
                print(f"DIFF {name}: {len(sa)} vs {len(sb)} rows, content differs")
                n_diff += 1
            else:
                n_same += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_diff += 1
    print(f"{n_same} identical, {n_diff} differ")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
