#!/usr/bin/env python3
"""Scale-sweep oracle gate: like check_oracle.py (same normalization and
compare semantics as the driver), but emits a CORRECTNESS_r{N}-shaped
JSON artifact and bounds each DuckDB oracle with a wall limit (an oracle
that cannot complete at the target scale is recorded as an explicit
exclusion, not a hang).

Usage: python3 tools/check_oracle_json.py <sfdir> <verify_out_dir> <json_out> [oracle_timeout_s]
"""
import sys, os, json, glob, math, threading, time
import duckdb
import pyarrow as pa

sfdir, outdir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 900.0

con = duckdb.connect()
try:
    duck_threads = int(os.environ.get("DUCK_THREADS", "16"))
except ValueError:
    print(f"warning: DUCK_THREADS={os.environ['DUCK_THREADS']!r} is not an "
          f"integer; falling back to 16", file=sys.stderr)
    duck_threads = 16
con.execute(f"SET threads TO {duck_threads}")
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def canon_type(t):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{canon_type(f.type)}" for f in t) + ">"
    return str(t)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def timed_oracle(sql):
    """Run one oracle with a wall limit; returns (table, err)."""
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        return con.execute(sql).fetch_arrow_table(), None
    except Exception as e:
        dt = time.time() - t0
        if dt >= timeout_s - 1:
            return None, f"oracle_timeout after {int(dt)}s"
        return None, f"duckdb error: {str(e)[:300]}"
    finally:
        timer.cancel()


results = {}
for name in sorted(set(oracle) | {os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d)}):
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[name] = rec
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        rec["err"] = "spark output missing"
        continue
    try:
        spark_tbl = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        rec["err"] = f"spark output unreadable: {str(e)[:200]}"
        continue
    rec["spark_rows"] = spark_tbl.num_rows
    if name not in oracle:
        rec["err"] = "no_oracle"
        continue
    t0 = time.time()
    duck, err = timed_oracle(oracle[name])
    if err:
        rec["err"] = err
        continue
    rec["oracle_rows"] = duck.num_rows
    dcols, scols = sorted(duck.column_names), sorted(spark_tbl.column_names)
    rec["rows_match"] = duck.num_rows == spark_tbl.num_rows
    rec["schema_match"] = (dcols == scols and all(
        canon_type(duck.schema.field(c).type) == canon_type(spark_tbl.schema.field(c).type)
        for c in dcols))
    if not (rec["rows_match"] and rec["schema_match"]):
        rec["hash_match"] = False
        if dcols != scols:
            rec["err"] = f"schema mismatch duck={dcols} spark={scols}"
        continue
    drows = sorted(tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist())
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in spark_tbl.to_pylist())
    rec["hash_match"] = drows == srows
    if not rec["hash_match"]:
        bad = next(((a, b) for a, b in zip(drows, srows) if a != b), None)
        rec["err"] = f"value mismatch; first: duck={bad[0][:4]} spark={bad[1][:4]}"
    print(f"  {name}: rows={rec['rows_match']} hash={rec['hash_match']} "
          f"({spark_tbl.num_rows} rows, oracle {time.time()-t0:.0f}s)", flush=True)

with open(json_out, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)

n_ok = sum(1 for r in results.values()
           if r["rows_match"] and r["schema_match"] and r["hash_match"])
n_excl = sum(1 for r in results.values() if r["err"] and (
    r["err"].startswith("oracle_timeout") or r["err"] == "no_oracle"))
n_fail = len(results) - n_ok - n_excl
print(f"== {n_ok} ok, {n_excl} excluded (timeout/no-oracle), {n_fail} FAIL of {len(results)}")
for name, r in sorted(results.items()):
    if r["err"] and not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
        print(f"   {name}: {r['err']}")
sys.exit(1 if n_fail else 0)
