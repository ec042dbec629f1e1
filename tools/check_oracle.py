#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Verify parquet dumps
(columns sorted by name, rows sorted, values hashed).

Optional 3rd arg: a JSON output path — per-query results are written
there in the driver artifact shape ({name: {"status": ..., "rows": N}}),
so a round can commit its own correctness record even when the driver's
gate crashes before writing one (round 12 shipped an empty artifact)."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
json_out = sys.argv[3] if len(sys.argv) > 3 else None
record = {}

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
        print(f"{name}: MISSING spark output"); fails += 1
        record[name] = {"status": "missing"}; continue
    try:
        got = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
        exp = canon(con.execute(sql).df())
    except Exception as e:
        print(f"{name}: ERROR {e}"); fails += 1
        record[name] = {"status": "err", "detail": str(e)[:200]}; continue
    if list(got.columns) != list(exp.columns):
        print(f"{name}: COLS got={list(got.columns)} exp={list(exp.columns)}")
        fails += 1
        record[name] = {"status": "cols_mismatch"}; continue
    if len(got) != len(exp):
        print(f"{name}: ROWS got={len(got)} exp={len(exp)}"); fails += 1
        record[name] = {"status": "rows_mismatch",
                        "got": len(got), "exp": len(exp)}; continue
    hg, he = hashable(got), hashable(exp)
    bad = [i for i, (a, b) in enumerate(zip(hg, he)) if a != b]
    if bad:
        i = bad[0]
        print(f"{name}: VALUES {len(bad)}/{len(hg)} rows differ; first at {i}:")
        print(f"   got: {hg[i][:300]}")
        print(f"   exp: {he[i][:300]}")
        fails += 1
        record[name] = {"status": "hash_mismatch", "differing": len(bad),
                        "rows": len(hg)}
    else:
        print(f"{name}: OK ({len(hg)} rows)")
        record[name] = {"status": "ok", "rows": len(hg)}

# rows-only checks for oracle-less queries: empty output is a FAILURE
# (the contract says rows > 0)
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = d.split("/")[-1]
    if name in oracle: continue
    pq = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(p)) for p in pq) if pq else 0
    if n == 0:
        print(f"{name}: rows-only n=0  (EMPTY — FAIL)"); fails += 1
        record[name] = {"status": "rows_only_empty"}
    else:
        print(f"{name}: rows-only n={n}")
        record[name] = {"status": "rows_only_ok", "rows": n}

if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "fails": fails,
                   "n_queries": len(record), "queries": record}, f,
                  indent=0, sort_keys=True)

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
