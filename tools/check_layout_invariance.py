#!/usr/bin/env python3
"""Layout-invariance gate: diff two Verify dump dirs — one driven on the
original testdata, one on a MakeShuffled copy (identical rows, different
physical layout). Every query's output must be VALUE-IDENTICAL as a
multiset: a difference means the query's result depends on partition
layout / row order (an under-specified window order, an order-sensitive
first()/collect_list, a partition-dependent sample) — the defect class
behind round 13's g_scc catch, hunted systematically.

Usage: python3 tools/check_layout_invariance.py <dumpA> <dumpB> [json_out]
Exit 1 iff any common query differs or is missing on one side.
"""
import sys, os, json, glob
import duckdb

a, b = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None

qa = {os.path.basename(d) for d in glob.glob(os.path.join(a, "*")) if os.path.isdir(d)}
qb = {os.path.basename(d) for d in glob.glob(os.path.join(b, "*")) if os.path.isdir(d)}
con = duckdb.connect()
con.execute(f"SET threads TO {int(os.environ.get('DUCK_THREADS', '16'))}")

results = {}
n_fail = 0
for name in sorted(qa | qb):
    if name not in qa or name not in qb:
        results[name] = f"missing on {'A' if name not in qa else 'B'} side"
        n_fail += 1
        continue
    try:
        con.execute("CREATE OR REPLACE TEMP VIEW _a AS "
                    f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')")
        con.execute("CREATE OR REPLACE TEMP VIEW _b AS "
                    f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')")
        cols = [r[0] for r in con.execute(
            "SELECT column_name FROM (DESCRIBE _a)").fetchall()]
        cl = ", ".join(f'"{c}"' for c in sorted(cols))
        n = con.execute(
            f"SELECT COUNT(*) FROM ((SELECT {cl} FROM _a EXCEPT ALL SELECT {cl} FROM _b)"
            f" UNION ALL BY NAME (SELECT {cl} FROM _b EXCEPT ALL SELECT {cl} FROM _a))"
        ).fetchone()[0]
        if n:
            results[name] = f"{n} rows differ between layouts"
            n_fail += 1
        else:
            results[name] = "ok"
    except Exception as e:
        results[name] = f"compare error: {str(e)[:200]}"
        n_fail += 1

if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
n_ok = sum(1 for v in results.values() if v == "ok")
print(f"== layout invariance: {n_ok} ok, {n_fail} FAIL of {len(results)}")
for k, v in sorted(results.items()):
    if v != "ok":
        print(f"   {k}: {v}")
sys.exit(1 if n_fail else 0)
