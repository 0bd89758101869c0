#!/usr/bin/env python3
"""Stage a 10x sf0.1 corpus ("sf1") for the confidence run.

events/documents/embeddings replicate 10x with shifted ids (new
src_file ranges, new conversations via user_id shift — conv-length
distribution preserved, 10x more conversations; hot-conv density
preserved since the shift is divisible by 5). Dimension tables copy
as-is. Both engines read the SAME staged files, so oracle parity is by
construction; the run exists to flush driver-side materialization,
codegen-limit fallbacks and super-linear plans that sf0.1 can't see.

Usage: python3 tools/stage_sf1.py [src_sfdir] [out_dir]
"""
import sys, shutil, pathlib
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPL = 10
# ESHIFT must keep floor(event_id/1000) within 4 digits: the synth's
# src_file is 'events_' || lpad(...,4,'0') and lpad TRUNCATES, so a
# bigger shift collides file names (and with them (src_file,src_offset)
# uniqueness — caught as a q227 tie-order mismatch). 100k also keeps
# the %4/%20/%1000 cadences (divisible) and event_ids unique (base max
# 99,999 at sf0.1).
ESHIFT = 100_000
USHIFT = 100_000         # divisible by 5 (hot rule); max shifted id 999_999 fits lpad-6
DSHIFT = 100_000
VSHIFT = 100_000

p = pathlib.Path(out)
if p.exists():
    shutil.rmtree(p)
p.mkdir(parents=True)

con = duckdb.connect()
con.execute(f"""
COPY (SELECT event_id + r.range * {ESHIFT} AS event_id, ts,
             user_id + r.range * {USHIFT} AS user_id,
             event_type, value, props
      FROM '{src}/events.parquet' CROSS JOIN range({REPL}) r
      ORDER BY event_id)
TO '{out}/events.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT doc_id + r.range * {DSHIFT} AS doc_id, text, lang, source, n_chars
      FROM '{src}/documents.parquet' CROSS JOIN range({REPL}) r
      ORDER BY doc_id)
TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT vec_id + r.range * {VSHIFT} AS vec_id, embedding, label
      FROM '{src}/embeddings.parquet' CROSS JOIN range({REPL}) r
      ORDER BY vec_id)
TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

for t in pathlib.Path(src).glob("*.parquet"):
    if t.stem not in ("events", "documents", "embeddings"):
        shutil.copy(t, p / t.name)

for t in sorted(p.glob("*.parquet")):
    n = con.execute(f"SELECT count(*) FROM '{t}'").fetchone()[0]
    print(f"{t.name}: {n}")
