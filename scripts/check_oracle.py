#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs the DuckDB oracle, mimicking
the driver's compare: for each dumped query result, run the oracle SQL on
the same parquet tables, sort columns by name, and compare row-by-row.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        # dtype mismatches (e.g. Spark ceil->LONG vs DuckDB ceil->DOUBLE)
        # would be canonicalized away below but may fail the driver's
        # stricter compare — fail loudly here
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        grows = [tuple(canon(v) for v in r) for r in got.itertuples(index=False)]
        erows = [tuple(canon(v) for v in r) for r in exp.itertuples(index=False)]
        if grows != erows:
            bad = next(i for i, (g, e) in enumerate(zip(grows, erows)) if g != e)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"   spark:  {grows[bad]}")
            print(f"   duckdb: {erows[bad]}")
            n_fail += 1
            continue
        flag = "  [WARN: 0-row match is vacuous]" if len(got) == 0 else ""
        print(f"PASS {name} ({len(got)} rows){flag}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
