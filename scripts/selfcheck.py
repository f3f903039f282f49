#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (sorted columns, sorted
rows) against the Spark result parquet written by graft.Verify.

Usage: selfcheck.py [outdir] [sfdir]
"""
import duckdb, json, sys, glob

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify-out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        ores = con.execute(sql)
        ocols = [c[0] for c in ores.description]
        orows = ores.fetchall()
        sres = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = [c[0] for c in sres.description]
        srows = sres.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fails += 1
        continue
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
        fails += 1
        continue
    oc, sc = canon(orows, ocols), canon(srows, scols)
    if oc != sc:
        diffs = [(a, b) for a, b in zip(oc, sc) if a != b][:3]
        print(f"FAIL {name}: rows oracle={len(oc)} spark={len(sc)} first-diffs={diffs}")
        fails += 1
    else:
        print(f"OK   {name}: {len(sc)} rows")
print("RESULT:", "ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
