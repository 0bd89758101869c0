#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables, load the Spark parquet output, compare
row count, schema (sorted column names), and value hash on sorted frames."""
import duckdb, glob, json, sys, hashlib
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# bound the buffer pool: with defaults (80% RAM, 32 threads) the 48-query
# run accumulates enough mappings/buffers that late queries die with
# tiny-block "Out of Memory" errors despite ~120 GB free. The heavy
# brute-force oracles at sf1 need more: override via env.
import os
mem = os.environ.get("GRAFT_DUCK_MEM", "8GB")
thr = os.environ.get("GRAFT_DUCK_THREADS", "8")
con.sql(f"SET memory_limit='{mem}'; SET threads={thr}")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only = os.environ.get("GRAFT_CHECK_ONLY")
if only:
    names = set(only.split(","))
    oracle = {q: sql for q, sql in oracle.items() if q in names}
ok = fail = 0
for q, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {str(e)[:300]}")
        fail += 1
        continue
    try:
        sdf = pd.read_parquet(f"{outdir}/{q}")
    except Exception as e:
        print(f"FAIL {q}: spark output missing: {e}")
        fail += 1
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {q}: schema {scols} vs oracle {ocols}")
        fail += 1
        continue
    o = odf[ocols].sort_values(ocols, ignore_index=True)
    s = sdf[scols].sort_values(scols, ignore_index=True)
    if len(o) != len(s):
        print(f"FAIL {q}: rows spark={len(s)} oracle={len(o)}")
        fail += 1
        continue
    # normalize dtypes for hash compare
    def norm(df):
        out = df.copy()
        for c in out.columns:
            if out[c].dtype == object:
                out[c] = out[c].astype(str)
            elif str(out[c].dtype).startswith("float"):
                out[c] = out[c].round(6)
            elif str(out[c].dtype).startswith("datetime"):
                out[c] = out[c].astype("datetime64[us]")
        return out
    o2, s2 = norm(o), norm(s)
    ho = hashlib.md5(o2.to_csv(index=False).encode()).hexdigest()
    hs = hashlib.md5(s2.to_csv(index=False).encode()).hexdigest()
    if ho != hs:
        diff = (o2 != s2) & ~(o2.isna() & s2.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {q}: hash mismatch ({int(bad.sum())}/{len(o2)} rows differ)")
        with pd.option_context("display.width", 250, "display.max_colwidth", 120):
            print("  oracle:", o2[bad].head(2).to_dict("records"))
            print("  spark :", s2[bad].head(2).to_dict("records"))
        fail += 1
    else:
        print(f"OK   {q} ({len(s)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
