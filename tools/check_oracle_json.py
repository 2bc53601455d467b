#!/usr/bin/env python3
"""Scale-sweep oracle gate: like check_oracle.py (same rows/schema/value
gates as the driver), but emits a CORRECTNESS_r{N}-shaped JSON artifact
and bounds each DuckDB oracle with a wall limit (an oracle that cannot
complete at the target scale is recorded as an explicit exclusion, not a
hang).

The value compare runs INSIDE DuckDB as a two-way EXCEPT ALL over the
name-sorted column list — exact multiset equality, equal-or-stricter
than the driver's sorted-stringified-rows compare (doubles compare by
exact value instead of repr, NaN==NaN and NULL==NULL hold in DuckDB set
semantics, integer widths coerce like the driver's canonical classes).
The Python-side row loop the driver can afford at sf0.01 is what this
tool replaces: at 100x several scalar-function queries emit 15M rows and
stringifying them in Python costs minutes per query; EXCEPT ALL keeps
the whole compare parallel and out-of-core.

Usage: python3 tools/check_oracle_json.py <sfdir> <verify_out_dir> <json_out> [oracle_timeout_s]
"""
import sys, os, json, glob, threading, time
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


def timed(sql):
    """Run one statement with a wall limit; returns err (None on success).

    Timeout detection is by PROVENANCE, not elapsed-time heuristics: the
    timer callback sets `fired` before interrupting, and only an
    InterruptException (or interrupt-shaped error) raised AFTER the flag
    is classified `oracle_timeout` — a genuine DuckDB error near the wall
    limit stays a FAIL. The done-flag check and the interrupt run under
    ONE lock, and the flag is set under the same lock right after execute
    returns — this NARROWS (but cannot close) the window for a timer that
    pops as the query finishes: the timer can still win the lock between
    execute returning and _finish, landing an interrupt on the idle
    connection that would cancel the NEXT statement. So when a fired
    timer is observed after a SUCCESSFUL execute, the stray interrupt is
    drained with a throwaway statement before it can poison the next
    query and misclassify it as FAIL.
    """
    state = {"fired": False, "done": False}
    lock = threading.Lock()

    def _interrupt():
        with lock:
            if not state["done"]:
                state["fired"] = True
                con.interrupt()

    def _finish():
        with lock:
            state["done"] = True

    timer = threading.Timer(timeout_s, _interrupt)
    timer.start()
    t0 = time.time()
    def _drain():
        # A fired timer whose interrupt was NOT consumed by the statement
        # that just finished leaves the interrupt pending on the idle
        # connection, where it would cancel the NEXT oracle query and
        # misclassify it as a spurious FAIL. Spend it on a sacrificial
        # statement instead.
        try:
            con.execute("SELECT 1")
        except Exception:
            pass

    try:
        con.execute(sql)
        _finish()
        if state["fired"]:
            _drain()  # timer won the race against _finish after success
        return None
    except duckdb.InterruptException:
        _finish()
        if state["fired"]:
            return f"oracle_timeout after {int(time.time() - t0)}s"
        return "duckdb error: interrupted without timeout"
    except Exception as e:
        _finish()
        if state["fired"] and "interrupt" in str(e).lower():
            return f"oracle_timeout after {int(time.time() - t0)}s"
        if state["fired"]:
            # genuine error AND a separately-fired timer: the error, not
            # the interrupt, aborted this statement — the interrupt is
            # still pending for whoever executes next
            _drain()
        return f"duckdb error: {str(e)[:300]}"
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
        con.execute("CREATE OR REPLACE TEMP VIEW _spark AS "
                    f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_schema = con.execute(
            "SELECT * FROM _spark LIMIT 0").fetch_arrow_table().schema
        rec["spark_rows"] = con.execute(
            "SELECT COUNT(*) FROM _spark").fetchone()[0]
    except Exception as e:
        rec["err"] = f"spark output unreadable: {str(e)[:200]}"
        continue
    if name not in oracle:
        rec["err"] = "no_oracle"
        continue
    t0 = time.time()
    err = timed("CREATE OR REPLACE TEMP TABLE _oracle AS " + oracle[name])
    if err:
        rec["err"] = err
        continue
    duck_schema = con.execute(
        "SELECT * FROM _oracle LIMIT 0").fetch_arrow_table().schema
    rec["oracle_rows"] = con.execute(
        "SELECT COUNT(*) FROM _oracle").fetchone()[0]
    dcols, scols = sorted(duck_schema.names), sorted(spark_schema.names)
    rec["rows_match"] = rec["oracle_rows"] == rec["spark_rows"]
    rec["schema_match"] = (dcols == scols and all(
        canon_type(duck_schema.field(c).type) == canon_type(spark_schema.field(c).type)
        for c in dcols))
    if not (rec["rows_match"] and rec["schema_match"]):
        rec["hash_match"] = False
        if dcols != scols:
            rec["err"] = f"schema mismatch duck={dcols} spark={scols}"
        elif not rec["schema_match"]:
            bad = [f"{c}: duck={canon_type(duck_schema.field(c).type)} "
                   f"spark={canon_type(spark_schema.field(c).type)}"
                   for c in dcols
                   if canon_type(duck_schema.field(c).type)
                   != canon_type(spark_schema.field(c).type)]
            rec["err"] = "type mismatch " + "; ".join(bad)
        continue
    cols = ", ".join(f'"{c}"' for c in dcols)
    err = timed(
        "CREATE OR REPLACE TEMP TABLE _diff AS "
        f"(SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle) "
        f"UNION ALL BY NAME "
        f"(SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark)")
    if err:
        rec["err"] = err.replace("oracle_timeout", "compare_timeout")
        continue
    n_diff = con.execute("SELECT COUNT(*) FROM _diff").fetchone()[0]
    rec["hash_match"] = n_diff == 0
    if not rec["hash_match"]:
        sample = con.execute("SELECT * FROM _diff LIMIT 1").fetchone()
        rec["err"] = f"value mismatch ({n_diff} rows differ); sample: {str(sample)[:200]}"
    print(f"  {name}: rows={rec['rows_match']} hash={rec['hash_match']} "
          f"({rec['spark_rows']} rows, oracle+compare {time.time()-t0:.0f}s)", flush=True)

with open(json_out, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)

n_ok = sum(1 for r in results.values()
           if r["rows_match"] and r["schema_match"] and r["hash_match"])
# Exclusions match EXPLICITLY (prefix/equality): a DuckDB error message or
# a value-mismatch sample row that happens to contain the word "timeout"
# must count as FAIL, not exclusion.
n_excl = sum(1 for r in results.values() if r["err"] and (
    r["err"].startswith(("oracle_timeout", "compare_timeout"))
    or r["err"] == "no_oracle"))
n_fail = len(results) - n_ok - n_excl
print(f"== {n_ok} ok, {n_excl} excluded (timeout/no-oracle), {n_fail} FAIL of {len(results)}")
for name, r in sorted(results.items()):
    if r["err"] and not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
        print(f"   {name}: {r['err']}")
sys.exit(1 if n_fail else 0)
