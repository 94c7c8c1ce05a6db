#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify (Spark)
on a scale dir, run each oracle SQL in DuckDB over the same parquet tables,
compare row counts + value multisets (column-name-sorted, like the driver).

Usage: python3 scripts/local_verify.py [sfdir] [outdir] [--skip-spark]
"""
import json, math, subprocess, sys, os, glob

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
skip_spark = "--skip-spark" in sys.argv

if not skip_spark:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    return str(v)

def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], sig

ok, bad = 0, 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING SPARK OUT {name}"); bad += 1; continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        scols = [d[0] for d in con.description]
        odf = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
    except Exception as e:
        print(f"ERROR {name}: {e}"); bad += 1; continue
    sc, ss = table_sig(scols, sdf)
    oc, os_ = table_sig(ocols, odf)
    if sc != oc:
        print(f"SCHEMA MISMATCH {name}: spark={sc} oracle={oc}"); bad += 1; continue
    if len(ss) != len(os_):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(ss)} oracle={len(os_)}"); bad += 1; continue
    if ss != os_:
        diffs = [(a, b) for a, b in zip(ss, os_) if a != b][:3]
        print(f"VALUE MISMATCH {name}: first diffs {diffs}"); bad += 1; continue
    print(f"OK {name} ({len(ss)} rows)"); ok += 1

# rows-only checks for queries without oracle
for spark_dir in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(spark_dir)
    if name in oracle: continue
    try:
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{spark_dir}/*.parquet')").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    except Exception as e:
        print(f"ROWS-ONLY ERROR {name}: {e}")

print(f"\n{ok} ok / {bad} bad of {len(oracle)} oracle queries")
sys.exit(1 if bad else 0)
