#!/usr/bin/env python3
"""Driver-style DuckDB oracle replay: for each entry in oracle_sql.json,
run the SQL over the sf parquet tables and exact-compare against the Spark
result parquet (sorted columns, sorted rows, hash of stringified values)."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # round-trip floats through repr at 10 significant digits like a hash
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

npass = nfail = nmissing = 0
results = {}
for name in sorted(oracle):
    pqs = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pqs:
        print(f"{name}: MISSING spark parquet")
        nmissing += 1
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in pqs],
                             ignore_index=True)
        ora_df = con.execute(oracle[name]).df()
        a, b = canon(spark_df), canon(ora_df)
        schema_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        if schema_ok and rows_ok:
            a2 = a.astype(str).reset_index(drop=True)
            b2 = b.astype(str).reset_index(drop=True)
            hash_ok = a2.equals(b2)
        else:
            hash_ok = False
        ok = schema_ok and rows_ok and hash_ok
        if ok:
            npass += 1
        else:
            nfail += 1
            print(f"{name}: FAIL schema={schema_ok} rows={rows_ok}"
                  f" ({len(a)} vs {len(b)}) hash={hash_ok}")
            if schema_ok and rows_ok and not hash_ok:
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  spark:", a[diff].head(3).to_dict("records"))
                print("  oracle:", b[diff].head(3).to_dict("records"))
            elif not schema_ok:
                print("  spark cols:", list(a.columns))
                print("  oracle cols:", list(b.columns))
    except Exception as e:
        nfail += 1
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
print(f"{npass}/{npass+nfail+nmissing} oracle checks pass "
      f"({nfail} fail, {nmissing} missing)")
sys.exit(0 if nfail == 0 and nmissing == 0 else 1)
