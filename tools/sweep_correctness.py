#!/usr/bin/env python3
"""Full-registry oracle sweep -> driver-format correctness JSON.

Replays every dumped query result in OUTDIR against its DuckDB oracle over
the SFDIR tables and writes ARTIFACT in the same shape as the driver's
CORRECTNESS_r{N}.json (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err, "no_oracle" for unoracled queries). Used for the one-time
sf0.1 sweep (VERDICT r11 #3): the per-round gate runs at sf0.01; this proves
the same 100% board holds at 10x the data.

Usage: python3 tools/sweep_correctness.py OUTDIR SFDIR ARTIFACT [LO [HI]]
LO/HI restrict to query names with LO <= name < HI (lexicographic) so long
sweeps can shard across processes; merge the shard JSONs afterwards.
"""
import json, math, os, sys

import duckdb

outdir, sfdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
lo = sys.argv[4] if len(sys.argv) > 4 else ""
hi = sys.argv[5] if len(sys.argv) > 5 else "￿"
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
# GEN-DIR OVERLAY (opt-in): ORACLE_OVERLAY names a JSON of {query: sql}
# merged OVER the primary oracles — the Q.genOracle faces Verify dumps as
# gen_oracle_sql.json. These exploit GenData's by-construction structure
# (near-dups planted only at adjacent doc_ids; video grids reducible to
# per-doc byte histograms) and are valid ONLY on GenData dirs; never set
# this for the driver's sf0.01/sf0.1 testdata. Cross-check protocol: run
# the same dump once without and once with the overlay at a scale where
# both referees are tractable — both green ⇒ the faces agree on that dir.
if os.environ.get("ORACLE_OVERLAY"):
    overlay = json.load(open(os.environ["ORACLE_OVERLAY"]))
    unknown = set(overlay) - set(oracle)
    if unknown:
        sys.exit(f"overlay names queries with no primary oracle: {sorted(unknown)}")
    oracle.update(overlay)
    print(f"[overlay] {len(overlay)} gen-face oracles active", flush=True)

con = duckdb.connect()
# Gen-scale sweeps (100M-row windows) exceed RAM without a spill path.
os.makedirs("/tmp/duck_tmp", exist_ok=True)
con.execute("SET temp_directory='/tmp/duck_tmp'")
con.execute(f"SET memory_limit='{os.environ.get('SWEEP_MEM', '80GB')}'")
# Wide windows over 100M-row frames spill far better with fewer threads
# (per-thread operator state is what overruns the limit).
con.execute(f"SET threads={os.environ.get('SWEEP_THREADS', '32')}")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.isdir(p):
        # Spark/GenData write directory-style parquet; DuckDB needs the glob
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    else:
        continue
    # GenData writes events.ts as an epoch-NANOS BIGINT (Spark can't write
    # TIMESTAMP(NANOS)); Tables.events truncates it to micros (`ts div
    # 1000`). Mirror that here so gen-dir sweeps see the same TIMESTAMP the
    # driver's nanos-typed testdata yields through DuckDB's NS->US cast.
    # Column type from DESCRIBE, not typeof() on a fetched row: an empty
    # events parquet makes fetchone() return None and would abort the whole
    # sweep before the first query (r14 ADVICE).
    if t == "events" and dict(
            (r[0], r[1]) for r in con.execute("DESCRIBE events").fetchall()
    ).get("ts") == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")

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

out = {}
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)) and lo <= d < hi)
for name in names:
    d = os.path.join(outdir, name)
    sq = con.execute(f"SELECT * FROM '{d}/*.parquet'")
    scols, srows = [c[0] for c in sq.description], sq.fetchall()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": len(srows), "oracle_rows": None, "err": None}
    if name not in oracle:
        rec["err"] = "no_oracle"
        out[name] = rec
        continue
    try:
        oq = con.execute(oracle[name])
        ocols, orows = [c[0] for c in oq.description], oq.fetchall()
    except Exception as e:
        rec["err"] = f"oracle error: {e}"
        rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = False
        out[name] = rec
        continue
    scols, srows = canon(scols, srows)
    ocols, orows = canon(ocols, orows)
    rec["oracle_rows"] = len(orows)
    rec["rows_match"] = len(srows) == len(orows)
    rec["schema_match"] = scols == ocols
    rec["hash_match"] = (rec["rows_match"] and rec["schema_match"] and
        all(all(eq(x, y) for x, y in zip(a, b))
            for a, b in zip(srows, orows)))
    out[name] = rec
    status = "ok  " if rec["hash_match"] else "FAIL"
    print(f"{status} {name} ({len(srows)} rows)", flush=True)

with open(artifact, "w") as f:
    json.dump(out, f, indent=2, sort_keys=True)
n_green = sum(1 for r in out.values() if r["hash_match"])
n_no = sum(1 for r in out.values() if r["err"] == "no_oracle")
print(f"{n_green}/{len(out) - n_no} oracled green, {n_no} no_oracle -> {artifact}")
sys.exit(0 if n_green == len(out) - n_no else 1)
