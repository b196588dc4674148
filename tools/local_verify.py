#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify-dumped
parquet results against the DuckDB oracles in oracle_sql.json over the same
sf tables, compare row count / column names / values.

Usage: python3 tools/local_verify.py OUTDIR SFDIR [name-substr ...]
(OUTDIR = the Verify.scala outDir; only queries with a dumped parquet dir
are checked.)
"""
import json, math, os, sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
subs = sys.argv[3:]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(r[i] for i in order) for r in rows]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b

fail = 0
for name in sorted(oracle):
    if subs and not any(s in name for s in subs):
        continue
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    sq = con.execute(f"SELECT * FROM '{d}/*.parquet'")
    scols, srows = [c[0] for c in sq.description], sq.fetchall()
    try:
        oq = con.execute(oracle[name])
        ocols, orows = [c[0] for c in oq.description], oq.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    scols, srows = canon(scols, srows)
    ocols, orows = canon(ocols, orows)
    if scols != ocols:
        print(f"FAIL {name}: schema spark={scols} oracle={ocols}")
        fail += 1
        continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        fail += 1
        continue
    bad = next((i for i, (a, b) in enumerate(zip(srows, orows))
                if not all(eq(x, y) for x, y in zip(a, b))), None)
    if bad is not None:
        print(f"FAIL {name}: first diff at row {bad}:\n  spark : {srows[bad]}\n  oracle: {orows[bad]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(srows)} rows)")
sys.exit(1 if fail else 0)
