#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only tool, not part
of the library): run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query result parquet in <outDir>, runs the matching oracle SQL
from oracle_sql.json in DuckDB (tables = views over <sfDir>/*.parquet),
sorts columns by name and rows by value, and compares cell-by-cell.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import os
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return str(v)  # raw, scale-sensitive: stricter than numeric equality
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def table_rows(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(c for c in cols), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    result_dirs = sorted(
        d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        if name not in oracle:
            print(f"  SKIP {name}: no oracle (rows-only "
                  f"{got_rel.shape[0]} rows)")
            continue
        try:
            want_rel = con.sql(oracle[name])
            got_cols, got = table_rows(got_rel)
            want_cols, want = table_rows(want_rel)
        except Exception as e:
            print(f"✗ FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"✗ FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got != want:
            n_fail += 1
            print(f"✗ FAIL {name}: {len(got)} vs {len(want)} rows")
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"    first diff row {i}:\n      got  {g}\n"
                          f"      want {w}")
                    break
            else:
                if len(got) != len(want):
                    print(f"    row-count mismatch only")
        else:
            n_pass += 1
            print(f"✓ pass {name} ({len(got)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
