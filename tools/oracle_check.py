#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only tool, not part
of the library): run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Driver-faithful conversion path (VERDICT r1: the previous replica
canonicalized both sides through DuckDB and passed 88/88 locally while the
driver scored 36/88):
  - Spark result parquet  -> pandas via pyarrow (pd.read_parquet)
  - oracle SQL            -> pandas via duckdb .df()
  - columns sorted by name, rows via pandas sort_values (this CRASHES on
    bytearray cells, exactly like the driver's comparator — a crash here is
    a real failure, not a tooling artifact)
  - strict dtype-sensitive cell compare (int64 10 != float64 10.0,
    Decimal('1.50') != 1.5): stricter-or-equal to the driver's value hash.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Canonical, dtype-sensitive cell repr (mimics a value hash)."""
    if v is None:
        return "\0N"
    if isinstance(v, float):
        if v != v:  # NaN == SQL NULL after pandas conversion
            return "\0N"
        return "f:" + repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "l:[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return "t:" + v.isoformat()
    return type(v).__name__[:1] + ":" + str(v)


def frame_rows(df):
    df = df[sorted(df.columns)]
    # driver-style row sort: raises TypeError on unhashable cells
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = [tuple(cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort()  # final canonical order (sort_values alone is enough, but
    # the canonicalized-cell sort makes diffs deterministic across dtypes)
    return list(df.columns), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata ships single-file tables; ScaleGen corpora
            # are Spark directory layouts — glob the parts in that case.
            # Recursive (**) so a Hive-partitioned nested layout still
            # resolves, and assert the glob matched: a zero-file view
            # would fail every oracle with a confusing empty-table
            # symptom instead of a clear error (ADVICE r13).
            if os.path.isdir(p):
                pat = f"{p}/**/*.parquet"
                assert glob.glob(pat, recursive=True), \
                    f"no parquet files under {p} (empty table dir?)"
            else:
                pat = p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    result_dirs = sorted(
        d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        if name not in oracle:
            n = len(pd.read_parquet(d))
            print(f"  SKIP {name}: no oracle (rows-only {n} rows)")
            continue
        try:
            got_df = pd.read_parquet(d)
            want_df = con.sql(oracle[name]).df()
            got_cols, got = frame_rows(got_df)
            want_cols, want = frame_rows(want_df)
        except Exception as e:
            print(f"✗ FAIL {name}: comparator error: "
                  f"{type(e).__name__}: {str(e)[:200]}")
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
                    print("    row-count mismatch only")
        else:
            n_pass += 1
            print(f"✓ pass {name} ({len(got)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
