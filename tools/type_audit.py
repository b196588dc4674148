#!/usr/bin/env python3
"""Oracle result-TYPE audit — catches the bug class tools/local_verify.py
cannot: the driver's correctness hash is TYPE-sensitive, so a DuckDB oracle
whose arithmetic widens to HUGEINT/DECIMAL (sum(), list_sum(), x OVER w, ...)
hash-mismatches a Spark BIGINT/DOUBLE column even when every VALUE is equal
(this exact class caused the only three r9 correctness failures).

For every oracle with a Verify-dumped parquet dir, compare DuckDB's LIMIT 0
result schema against the Spark parquet schema and flag any pairing the
driver's typed hash would reject.

Usage: python3 tools/type_audit.py OUTDIR SFDIR
"""
import json, os, sys

import duckdb
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

bad = []
for name in sorted(oracle):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    try:
        # Relation .types carries real DuckDB logical types (BIGINT, HUGEINT,
        # DECIMAL(p,s), ...). cursor.description does NOT — the DB-API maps
        # every numeric to 'NUMBER', which is how the r12 x_unpivot HUGEINT
        # slipped past this audit despite the explicit branch below.
        rel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
        dd = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    except Exception as e:
        bad.append((name, "oracle-error", str(e)[:100]))
        continue
    sch = None
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            sch = pq.read_schema(os.path.join(d, f))
            break
    if sch is None:
        continue
    sp = {n: str(sch.field(n).type) for n in sch.names}
    for cname, dt in dd.items():
        if cname not in sp:
            bad.append((name, cname, "missing in spark output"))
        elif dt == "HUGEINT":
            bad.append((name, cname, f"HUGEINT vs {sp[cname]} — CAST the oracle column AS BIGINT"))
        elif dt.startswith("DECIMAL") and not sp[cname].startswith("decimal"):
            bad.append((name, cname, f"{dt} vs {sp[cname]}"))
        elif dt in ("INTEGER", "SMALLINT", "TINYINT") and sp[cname] == "int64":
            bad.append((name, cname, f"{dt} vs {sp[cname]} — CAST the oracle column AS BIGINT"))
        elif dt == "BIGINT" and sp[cname] != "int64":
            bad.append((name, cname, f"BIGINT vs {sp[cname]}"))
        elif dt == "DOUBLE" and sp[cname] != "double":
            bad.append((name, cname, f"DOUBLE vs {sp[cname]}"))

print(f"type mismatches: {len(bad)}")
for b in bad:
    print("  ", b)
sys.exit(1 if bad else 0)
