#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-differential correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle_sql.json query in DuckDB over the sfDir tables, sorts columns by name,
and compares row-by-row. Dev tool only — the engine itself is pure Scala.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize datetimes to us precision for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            want = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1; continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # order-insensitive compare (sort by all columns), mirroring a hash of sorted rows
        gs = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns), na_position="first").reset_index(drop=True)
        try:
            # dtype-strict: the driver hashes typed values, so a DuckDB HUGEINT
            # vs Spark int64 mismatch must fail here too.
            pd.testing.assert_frame_equal(gs, ws, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex)[:400]}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
