#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify at a given sf dir, then run each oracle SQL in DuckDB
over the same parquet tables and compare row sets (columns sorted by
name, rows sorted, values normalized)."""
import json, math, subprocess, sys, decimal, datetime

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

import duckdb, pyarrow.parquet as pq
import glob, os

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY: continue
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    t = pq.read_table(pdir)
    scols = [c.lower() for c in t.column_names]
    srows = [tuple(r[c] for c in t.column_names) for r in t.to_pylist()]
    try:
        res = con.execute(oracle[name])
        ocols = [d[0].lower() for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}"); fails += 1; continue
    if len(sr) != len(orr):
        print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}"); fails += 1
        sset, oset = set(sr), set(orr)
        for x in list(sset - oset)[:3]: print("  spark-only:", x)
        for x in list(oset - sset)[:3]: print("  oracle-only:", x)
        continue
    if sr != orr:
        diff = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
        print(f"FAIL {name}: {len(diff)} differing rows of {len(sr)}; first at {diff[0]}")
        print("  spark :", sr[diff[0]])
        print("  oracle:", orr[diff[0]])
        fails += 1; continue
    print(f"PASS {name} ({len(sr)} rows)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
