#!/usr/bin/env python3
"""Driver-mimic correctness check: for each SparkEntry oracle query, run
the DuckDB SQL over the sf tables and compare with the Spark parquet
dump from graft.Verify (columns sorted by name, values hashed)."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    # canonical string form per cell (floats via repr, like a hash would see)
    return df

def digest(df):
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]

fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = norm(con.sql(sql).df())
        sdf = norm(pd.concat([pd.read_parquet(p) for p in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))]))
        status = []
        if list(odf.columns) != list(sdf.columns):
            status.append(f"cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        if len(odf) != len(sdf):
            status.append(f"rows oracle={len(odf)} spark={len(sdf)}")
        if not status:
            if [str(t) for t in odf.dtypes] != [str(t) for t in sdf.dtypes]:
                status.append(f"dtypes oracle={list(map(str,odf.dtypes))} spark={list(map(str,sdf.dtypes))}")
            if digest(odf) != digest(sdf):
                neq = []
                for c in odf.columns:
                    a, b = odf[c].tolist(), sdf[c].tolist()
                    bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if repr(x) != repr(y)]
                    if bad:
                        neq.append(f"{c}: {len(bad)} diffs, first={bad[0]}")
                status.append("HASH " + "; ".join(neq[:3]))
        if status:
            fails.append(name)
            print(f"FAIL {name}: {' | '.join(status)}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {e}")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
