#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity (mirrors the driver's
t2 gate): run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this
script runs each oracle_sql.json entry in DuckDB over the same parquet tables
and compares values against the Spark parquet dumps (columns sorted by name,
rows sorted by all columns, exact hash of the textual form)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes = [], []
for name in sorted(oracle):
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        fails.append((name, "no spark output")); continue
    try:
        sp = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        du = canon(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    if list(sp.columns) != list(du.columns):
        fails.append((name, f"cols spark={list(sp.columns)} duck={list(du.columns)}")); continue
    if len(sp) != len(du):
        fails.append((name, f"rows spark={len(sp)} duck={len(du)}")); continue
    if sp.dtypes.to_dict() != du.dtypes.to_dict():
        # not fatal for the text compare, but report
        print(f"  [warn] {name} dtypes differ: {[(c, str(sp[c].dtype), str(du[c].dtype)) for c in sp.columns if sp[c].dtype != du[c].dtype]}")
    a, b = sp.astype(str), du.astype(str)
    if a.equals(b):
        passes.append(name)
    else:
        neq = (a != b)
        cells = int(neq.values.sum())
        badcols = [c for c in a.columns if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        fails.append((name, f"{cells} cells differ, cols={badcols}; first row {i}: "
                            f"spark={sp.loc[i, badcols].to_dict()} duck={du.loc[i, badcols].to_dict()}"))

print(f"\nPASS {len(passes)}: {' '.join(passes)}")
missing = [n for n in os.listdir(outdir) if os.path.isdir(f"{outdir}/{n}") and n not in oracle]
if missing:
    print(f"NO-ORACLE (rows-only) {len(missing)}: {' '.join(sorted(missing))}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
