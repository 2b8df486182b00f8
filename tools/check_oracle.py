#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output against
DuckDB oracles and compare value-by-value (columns sorted by name, rows
sorted). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"MISSING  {name}: no spark output"); fail += 1; continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ORA-ERR  {name}: {e}"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{res_path}/*.parquet")])
    gw, ww = got.reindex(sorted(got.columns), axis=1), want.reindex(sorted(want.columns), axis=1)
    if sorted(gw.columns) != sorted(ww.columns):
        print(f"SCHEMA   {name}: spark={sorted(gw.columns)} oracle={sorted(ww.columns)}"); fail += 1; continue
    if len(gw) != len(ww):
        print(f"ROWS     {name}: spark={len(gw)} oracle={len(ww)}"); fail += 1; continue
    # normalize: dates/timestamps -> iso strings, floats kept as-is
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if str(df[c].dtype).startswith(("datetime", "date")):
                df[c] = df[c].astype(str)
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    gn, wn = norm(gw), norm(ww)
    try:
        pd.testing.assert_frame_equal(gn, wn, check_dtype=False, check_exact=True)
        print(f"OK       {name} ({len(gw)} rows)")
    except AssertionError as e:
        fail += 1
        print(f"MISMATCH {name}: {str(e).splitlines()[-1] if str(e) else e}")
        # show a small diff sample
        neq = (gn != wn) & ~(gn.isna() & wn.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = gn.index[bad][:3]
            print("  spark:\n", gn.loc[i].to_string())
            print("  oracle:\n", wn.loc[i].to_string())
print("FAILED" if fail else "ALL OK", f"({len(oracle)} queries, {fail} failures)")
sys.exit(1 if fail else 0)
