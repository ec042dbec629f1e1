#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Verify parquet dumps
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def hashable(df):
    rows = []
    for row in df.itertuples(index=False):
        r = []
        for v in row:
            if isinstance(v, float):
                r.append("null" if math.isnan(v) else repr(v))
            elif v is None or v is pd.NaT:
                r.append("null")
            else:
                r.append(str(v))
        rows.append("|".join(r))
    return rows

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        got = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
        exp = canon(con.execute(sql).df())
    except Exception as e:
        print(f"{name}: ERROR {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"{name}: COLS got={list(got.columns)} exp={list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"{name}: ROWS got={len(got)} exp={len(exp)}"); fails += 1; continue
    hg, he = hashable(got), hashable(exp)
    bad = [i for i, (a, b) in enumerate(zip(hg, he)) if a != b]
    if bad:
        i = bad[0]
        print(f"{name}: VALUES {len(bad)}/{len(hg)} rows differ; first at {i}:")
        print(f"   got: {hg[i][:300]}")
        print(f"   exp: {he[i][:300]}")
        fails += 1
    else:
        print(f"{name}: OK ({len(hg)} rows)")

# rows-only checks for oracle-less queries: empty output is a FAILURE
# (the contract says rows > 0)
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = d.split("/")[-1]
    if name in oracle: continue
    pq = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(p)) for p in pq) if pq else 0
    if n == 0:
        print(f"{name}: rows-only n=0  (EMPTY — FAIL)"); fails += 1
    else:
        print(f"{name}: rows-only n={n}")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
