#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the same parquet tables and compares to the Verify output
parquet (row count, column names, and value hash over column-name-sorted,
row-sorted data)."""
import sys, os, json, glob
import duckdb, pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize ints
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    if only and name not in only: continue
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL  {name}: no spark output"); fails.append(name); continue
    try:
        spark_df = canon(pq.read_table(path).to_pandas())
        duck_df = canon(con.execute(oracle[name]).fetch_df())
    except Exception as e:
        print(f"FAIL  {name}: {e}"); fails.append(name); continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL  {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails.append(name); continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL  {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fails.append(name); continue
    try:
        pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                      check_exact=True)
        print(f"OK    {name} ({len(spark_df)} rows)")
    except AssertionError as e:
        msg = str(e).split("\n")[0:3]
        print(f"FAIL  {name}: values differ: {' | '.join(msg)}")
        fails.append(name)

spark_only = [k for k in glob.glob(f"{outdir}/*") if os.path.isdir(k)
              and os.path.basename(k) not in oracle]
for k in spark_only:
    print(f"ROWS-ONLY {os.path.basename(k)}: {pq.read_table(k).num_rows} rows")

print(f"\n{len(fails)} failures" + (": " + ", ".join(fails) if fails else ""))
sys.exit(1 if fails else 0)
