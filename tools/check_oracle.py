#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate.

NOT part of the engine (the Scala library never depends on this); it
replays what the driver does: run graft.Verify to dump each query's
result to parquet + oracle_sql.json, then execute each oracle SQL in
DuckDB over the same testdata tables and compare (columns sorted by
name, rows compared as sorted value tuples).

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, os, json, glob, math
import duckdb
import pyarrow as pa

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata = single files; MakeSf scale-up dirs = Spark layout
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon_type(t):
    """Canonical arrow type name: unify representation-only differences
    the driver's hash also tolerates (integer/float WIDTH — r8 shipped
    with e.g. w_row_number's duck int64 vs spark int32 green; string vs
    large_string; timestamp tz annotation) but keep genuine type-CLASS
    divergences (int64 vs decimal128 — the DuckDB HUGEINT trap that
    str()-normalized value compare can't see but the driver's hash can)."""
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
        return repr(v)  # full precision
    return str(v)

fail, ok, skipped = [], [], []
for name in sorted(oracle):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        fail.append((name, "spark output missing"))
        continue
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        fail.append((name, f"duckdb error: {e}"))
        continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_arrow_table()
    dcols, scols = sorted(duck.column_names), sorted(spark.column_names)
    if dcols != scols:
        fail.append((name, f"schema mismatch duck={dcols} spark={scols}"))
        continue
    tbad = [(c, canon_type(duck.schema.field(c).type), canon_type(spark.schema.field(c).type))
            for c in dcols
            if canon_type(duck.schema.field(c).type) != canon_type(spark.schema.field(c).type)]
    if tbad:
        fail.append((name, "type mismatch " + "; ".join(
            f"{c}: duck={dt} spark={st}" for c, dt, st in tbad)))
        continue
    drows = sorted(tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist())
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in spark.to_pylist())
    if len(drows) != len(srows):
        fail.append((name, f"row count duck={len(drows)} spark={len(srows)}"))
        continue
    bad = [(a, b) for a, b in zip(drows, srows) if a != b]
    if bad:
        fail.append((name, f"{len(bad)}/{len(drows)} rows differ; first: duck={bad[0][0][:6]} spark={bad[0][1][:6]}"))
    else:
        ok.append((name, len(drows)))

# queries without oracle: rows-only check
for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(qdir)
    if not os.path.isdir(qdir) or name in oracle:
        continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
    skipped.append((name, n))

print(f"== OK ({len(ok)}):")
for n, c in ok:
    print(f"   {n}: {c} rows")
print(f"== NO-ORACLE rows-only ({len(skipped)}):")
for n, c in skipped:
    print(f"   {n}: {c} rows")
print(f"== FAIL ({len(fail)}):")
for n, msg in fail:
    print(f"   {n}: {msg}")
sys.exit(1 if fail else 0)
