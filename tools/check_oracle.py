#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
output against DuckDB oracle SQL on the same parquet tables and
compare (row count, column names, value hash with columns sorted by
name and rows sorted)."""
import sys, json, glob, decimal, math
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dirs = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_dirs:
        print(f"FAIL {name}: no spark output");  fails += 1;  continue
    t = pq.read_table(f"{out_dir}/{name}")
    s_cols = t.column_names
    s_rows = [tuple(r[c] for c in s_cols) for r in t.to_pylist()]
    try:
        res = con.sql(sql)
        d_cols = list(res.columns)
        d_types = [str(t) for t in res.types]
        d_rows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}");  fails += 1;  continue
    # Version-portability guard: DuckDB promotes integer SUMs to
    # HUGEINT and decimal outputs vary in client representation across
    # versions — both have burned the driver-side hash before. Treat
    # any such output column as a failure even if values match here.
    drifty = [f"{c}:{t}" for c, t in zip(d_cols, d_types)
              if t == "HUGEINT" or t.startswith("DECIMAL")]
    if drifty:
        print(f"FAIL {name}: version-fragile oracle output types {drifty} "
              "(wrap in CAST(... AS BIGINT/DOUBLE))")
        fails += 1;  continue
    sc, sr = canon(s_cols, s_rows)
    dc, dr = canon(d_cols, d_rows)
    if sc != dc:
        print(f"FAIL {name}: cols spark={sc} duck={dc}");  fails += 1;  continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}");  fails += 1;  continue
    if sr != dr:
        bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
        print(f"FAIL {name}: {len([1 for a,b in zip(sr,dr) if a!=b])}/{len(sr)} rows differ; first: ")
        for i in bad:
            print(f"   spark={sr[i]}")
            print(f"   duck ={dr[i]}")
        fails += 1;  continue
    print(f"OK   {name} ({len(sr)} rows)")
rows_only = [n for n in glob.glob(f"{out_dir}/*/") if n.split('/')[-2] not in oracle and n.split('/')[-2] != '']
for n in sorted(rows_only):
    name = n.split('/')[-2]
    t = pq.read_table(n)
    if t.num_rows == 0:
        # driver contract: rows-only queries must return rows
        print(f"FAIL {name}: rows-only query returned 0 rows");  fails += 1
    else:
        print(f"ROWS {name}: {t.num_rows} rows OK")
sys.exit(1 if fails else 0)
