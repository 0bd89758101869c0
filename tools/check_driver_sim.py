#!/usr/bin/env python3
"""Driver-harness simulation of the correctness gate: identical to the
driver's run (one DuckDB connection, DEFAULT config — no memory/thread
bounds — all oracles in sorted order) rather than check.py's locally
bounded config. Round 3's gate lost 13 string-heavy oracles to tiny-block
OutOfMemory under exactly this setup; the fix rides IN the oracle SQL
(Oracle.duckPin — q01 bounds the connection at the head of the sorted
run), so this script must show 296/296 with zero errors WITHOUT any
harness-side bounds."""
import duckdb, glob, json, sys, hashlib
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()  # DELIBERATELY no SET memory_limit / threads
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for q, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {str(e)[:200]}")
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
        print(f"FAIL {q}: hash mismatch")
        fail += 1
    else:
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
