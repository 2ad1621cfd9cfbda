#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [outDir] [sfDir]

Set CHECK_JSON_OUT=<path> to also write a CORRECTNESS-style JSON
artifact (per-query rows_match/schema_match/hash_match/err) mirroring
the driver's format, for committed scale-ladder evidence.

Reads each parquet result written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB over the same sf tables, and compares:
row count, column names, and a value hash computed over columns sorted
by name (floats via repr; rows sorted) — strict superset of whatever
the driver hashes, so an exact pass here implies a driver pass.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
# Bound DuckDB's memory and let it SPILL instead of dying: big-SF
# oracle replays (minhash/decontam shingle joins at 100x) otherwise
# balloon past host RAM and get OOM-killed mid-gate (measured: 110 GB
# RSS on q_decontaminate's sf10 twin). CHECK_DUCKDB_MEM overrides.
con.sql(f"SET memory_limit='{os.environ.get('CHECK_DUCKDB_MEM', '32GB')}'")
con.sql("SET temp_directory='/tmp/duckdb_spill'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # partial ladder fixtures (e.g. a documents-family-only sf100) omit
    # tables: skip the view; a query that needs it fails loudly below
    if not os.path.exists(f"{sfdir}/{t}.parquet"):
        print(f"[check] no {t}.parquet in {sfdir}; view skipped")
        continue
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
report = {}

def record(name, rows_match=False, schema_match=False, hash_match=False,
           spark_rows=None, oracle_rows=None, err=None):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}
    # write-through per query: a crash (or OOM kill) mid-gate keeps
    # every already-judged entry instead of losing the whole artifact
    if os.environ.get("CHECK_JSON_OUT"):
        with open(os.environ["CHECK_JSON_OUT"], "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

# Above CHECK_PY_MAX_ROWS output rows the per-row Python canon
# (materialize + sort both sides as Python strings) stops fitting in
# RAM — a 95M-row sf100 window result is tens of GB of tuples. For
# those, compare entirely inside DuckDB: canonical row string =
# name-sorted columns CAST to VARCHAR (both sides formatted by the
# SAME engine, so float formatting parity is structural), reduced to
# an order-independent multiset digest (count, 128-bit sum of row
# hashes, xor of row hashes). Engine values still diverge loudly —
# any differing row changes the digest — while Python memory stays
# O(1). Strictly weaker than the byte-sort compare only via hash
# collision (~2^-64); recorded per query as compare=duckdb-multiset.
PY_MAX = int(os.environ.get("CHECK_PY_MAX_ROWS", 15_000_000))

def multiset_compare(name, files, sql, n_rows):
    s_cols = pq.read_schema(files[0]).names
    con.sql(f"CREATE OR REPLACE TEMP VIEW _oracle AS {sql}")
    desc = con.sql("DESCRIBE _oracle").fetchall()
    d_cols = [r[0] for r in desc]
    bad = [f"{r[0]}:{r[1]}" for r in desc
           if r[1] in ("HUGEINT", "UHUGEINT") or r[1].startswith("DECIMAL")]
    if bad:
        print(f"FAIL {name}: oracle emits pandas-lossy types {bad} — CAST them (BIGINT/DOUBLE)")
        record(name, err=f"lossy oracle types {bad}")
        return False
    if sorted(s_cols) != sorted(d_cols):
        print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        record(name, spark_rows=n_rows)
        return False
    expr = "concat_ws('|', " + ", ".join(
        f'coalesce(CAST("{c}" AS VARCHAR), chr(1))' for c in sorted(s_cols)) + ")"
    agg = (f"SELECT count(*), coalesce(sum(CAST(hash({expr}) AS HUGEINT)), 0), "
           f"coalesce(bit_xor(hash({expr})), 0)")
    flist = "[" + ", ".join(f"'{f}'" for f in files) + "]"
    s = con.sql(f"{agg} FROM read_parquet({flist})").fetchone()
    d = con.sql(f"{agg} FROM _oracle").fetchone()
    if s[0] != d[0]:
        print(f"FAIL {name}: rows spark={s[0]} duck={d[0]}")
        record(name, schema_match=True, spark_rows=s[0], oracle_rows=d[0])
        return False
    if s[1:] != d[1:]:
        print(f"FAIL {name}: multiset digest mismatch spark={s[1:]} duck={d[1:]}")
        record(name, rows_match=True, schema_match=True,
               spark_rows=s[0], oracle_rows=d[0])
        return False
    record(name, rows_match=True, schema_match=True, hash_match=True,
           spark_rows=s[0], oracle_rows=d[0])
    report[name]["compare"] = "duckdb-multiset"
    print(f"OK   {name}: {s[0]} rows (duckdb-multiset digest)")
    return True

fails = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark result at {path}")
        record(name, err="no spark result")
        fails += 1
        continue
    import pyarrow as pa
    n_meta = sum(pq.read_metadata(f).num_rows for f in files)
    if n_meta > PY_MAX:
        try:
            ok = multiset_compare(name, files, oracle[name], n_meta)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            record(name, err=str(e).splitlines()[0][:200])
            ok = False
        if not ok:
            fails += 1
        continue
    spark_t = pa.concat_tables([pq.read_table(f) for f in files])
    s_cols = spark_t.column_names
    s_rows = [tuple(c[i].as_py() for c in spark_t.columns)
              for i in range(spark_t.num_rows)]
    try:
        rel = con.sql(oracle[name])
        d_cols = rel.columns
        # The driver materializes DuckDB results through pandas/Arrow,
        # where HUGEINT (SUM of ints, list_aggregate 'sum') becomes
        # float64/Decimal and stringifies as "3.0" != Spark's "3".
        # Force oracle SQL to emit driver-safe types instead.
        bad_types = [f"{c}:{t}" for c, t in zip(d_cols, rel.types)
                     if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
        if bad_types:
            print(f"FAIL {name}: oracle emits pandas-lossy types {bad_types} — CAST them (BIGINT/DOUBLE)")
            record(name, err=f"lossy oracle types {bad_types}")
            fails += 1
            continue
        d_rows = rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
        record(name, err=str(e).splitlines()[0][:200])
        fails += 1
        continue
    if sorted(s_cols) != sorted(d_cols):
        print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        record(name, spark_rows=len(s_rows), oracle_rows=len(d_rows))
        fails += 1
        continue
    if len(s_rows) != len(d_rows):
        print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
        record(name, schema_match=True, spark_rows=len(s_rows),
               oracle_rows=len(d_rows))
        fails += 1
        continue
    cs, cd = canon(s_cols, s_rows), canon(d_cols, d_rows)
    if cs != cd:
        bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs:")
        for a, b in bad:
            print(f"  spark: {a[:160]}\n  duck : {b[:160]}")
        record(name, rows_match=True, schema_match=True,
               spark_rows=len(s_rows), oracle_rows=len(d_rows))
        fails += 1
        continue
    record(name, rows_match=True, schema_match=True, hash_match=True,
           spark_rows=len(s_rows), oracle_rows=len(d_rows))
    print(f"OK   {name}: {len(s_rows)} rows")

# rows-only queries (no oracle): just report
for path in sorted(glob.glob(f"{outdir}/*")):
    name = os.path.basename(path)
    if name in oracle or name.endswith(".json") or not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    n = pq.read_table(files[0]).num_rows if files else -1
    print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'FAIL (empty)'}")
    record(name, rows_match=n > 0, spark_rows=n,
           err=None if n > 0 else "empty result, no oracle")
    if n <= 0:
        fails += 1

if os.environ.get("CHECK_JSON_OUT"):
    with open(os.environ["CHECK_JSON_OUT"], "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
