#!/usr/bin/env python3
"""Published-TYPE lint over a Verify dump (round-15 verdict item #1).

The driver's correctness hash is TYPE-sensitive. tools/type_audit.py catches
the RELATIVE class (oracle type != Spark type); this lint catches the
ABSOLUTE class that slipped past it in r15: `x_spearman_corr` published a
DECIMAL(38,0) witness column on BOTH engines — so the audit's side-by-side
compare was clean — yet the driver's hash of a decimal column still
mismatched. The fix class is structural: every ORACLED query's published
schema must use only the driver-hash-PROVEN types, i.e. the types that have
survived the driver gate across 15 rounds x 260+ queries:

  parquet (Spark side): int64, double, string/large_string, date32[day],
                        timestamp[us]/timestamp[ns] (no tz), int32, bool
  DuckDB  (oracle side): BIGINT, DOUBLE, VARCHAR, DATE, TIMESTAMP[_NS],
                         INTEGER, BOOLEAN

int32 and bool are in the proven set on EVIDENCE, not aspiration: seven
registry queries (u6_filter_numeric's raw parquet l_linenumber, the
is_anomaly/is_current/is_balanced/is_high/keep flags) have published them
MATCHED on both engines through 15 rounds of green driver rows. The failing
class is DECIMAL / HUGEINT / FLOAT / arrays / structs — publish those CAST
to a proven type (integers → BIGINT, exact wide sums → DOUBLE via the
correctly-rounded conversion both engines share). Non-oracled queries
(accuracy-gated no_oracle contracts) are exempt: the driver never hashes
them.

Usage:  python3 tools/published_type_lint.py OUTDIR     # lint a Verify dump
        python3 tools/published_type_lint.py --selftest # planted DECIMAL must FAIL
Exit 1 on any offending column.
"""
import json
import os
import re
import sys

# Arrow physical types the driver's typed hash has proven across rounds.
PARQUET_OK = re.compile(
    r"^(int64|double|string|large_string|date32\[day\]|"
    r"timestamp\[(us|ns)\]|int32|bool)$")
# DuckDB logical types proven on the oracle side.
DUCKDB_OK = re.compile(
    r"^(BIGINT|DOUBLE|VARCHAR|DATE|TIMESTAMP(_NS)?|INTEGER|BOOLEAN)$")


def lint_dump(outdir: str) -> list:
    """[(query, column, offending type, side)] over every oracled query."""
    import pyarrow.parquet as pq
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    bad = []
    for name in sorted(oracle):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue  # query failed to dump; _failures.json owns that signal
        sch = None
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                sch = pq.read_schema(os.path.join(d, f))
                break
        if sch is None:
            continue
        for fname in sch.names:
            t = str(sch.field(fname).type)
            if not PARQUET_OK.match(t):
                bad.append((name, fname, t, "spark"))
    return bad


def lint_oracle(outdir: str, sfdir: str) -> list:
    """Oracle-side absolute check (duckdb available driver-side only)."""
    try:
        import duckdb
    except ImportError:
        return []
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = []
    for name in sorted(oracle):
        try:
            rel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
        except Exception:
            continue  # type_audit owns oracle-error reporting
        for c, t in zip(rel.columns, rel.types):
            if not DUCKDB_OK.match(str(t).upper()):
                bad.append((name, c, str(t).upper(), "oracle"))
    return bad


def selftest() -> int:
    """A planted DECIMAL output must FAIL; a proven-type output must pass."""
    import decimal
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    ok = True
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "planted_decimal"))
        pq.write_table(
            pa.table({
                "n": pa.array([1], pa.int64()),
                "sum_d2": pa.array([decimal.Decimal(7)],
                                   pa.decimal128(38, 0)),
            }),
            os.path.join(tmp, "planted_decimal", "part-0.parquet"))
        os.makedirs(os.path.join(tmp, "clean_query"))
        pq.write_table(
            pa.table({
                "n": pa.array([1], pa.int64()),
                "sum_d2": pa.array([7.0], pa.float64()),
                "grp": pa.array(["a"], pa.string()),
            }),
            os.path.join(tmp, "clean_query", "part-0.parquet"))
        with open(os.path.join(tmp, "oracle_sql.json"), "w") as f:
            json.dump({"planted_decimal": "SELECT 1", "clean_query": "SELECT 1"}, f)
        bad = lint_dump(tmp)
        if not any(q == "planted_decimal" and t.startswith("decimal")
                   for q, _, t, _ in bad):
            print("selftest FAIL: the planted DECIMAL(38,0) column passed the lint")
            ok = False
        if any(q == "clean_query" for q, _, _, _ in bad):
            print("selftest FAIL: proven-type columns were flagged")
            ok = False
    print("published_type_lint selftest:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest()
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/precommit_out"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else None
    bad = lint_dump(outdir)
    if sfdir:
        bad += lint_oracle(outdir, sfdir)
    if bad:
        print(f"published_type_lint: {len(bad)} column(s) publish a type "
              "OUTSIDE the driver-hash-proven set "
              "{BIGINT, DOUBLE, STRING, DATE, TIMESTAMP_NTZ}:")
        for q, c, t, side in bad:
            print(f"  {q}.{c}: {t} ({side} side) — CAST it to a proven type "
                  "on BOTH engines")
        return 1
    n = len([d for d in os.listdir(outdir)
             if os.path.isdir(os.path.join(outdir, d))])
    print(f"published_type_lint: OK ({n} query dumps scanned)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
