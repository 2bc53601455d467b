#!/usr/bin/env bash
# Liveness self-test for the scale-sweep oracle gate: a verifier that
# never fails is indistinguishable from one that never checks. Copies
# one query's dump from a Verify outdir, asserts the checker PASSES it,
# then corrupts a single value in the parquet and asserts the checker
# FAILS it (exit 1 + hash_match=false).
#
# Usage: tools/check_oracle_selftest.sh <sfdir> <verify_out_dir> [query=a_agg]
set -euo pipefail
sfdir="$1"; outdir="$2"; q="${3:-a_agg}"
work=$(mktemp -d)
trap 'rm -rf "$work"' EXIT
cp -r "$outdir/$q" "$work/$q"
python3 - "$outdir" "$q" "$work" << 'EOF'
import json, sys
outdir, q, work = sys.argv[1:4]
o = json.load(open(f"{outdir}/oracle_sql.json"))
json.dump({q: o[q]}, open(f"{work}/oracle_sql.json", "w"))
EOF
echo "[selftest] clean copy must PASS"
python3 "$(dirname "$0")/check_oracle_json.py" "$sfdir" "$work" "$work/clean.json" 120
python3 - "$work" "$q" << 'EOF'
import glob, sys
import pyarrow as pa, pyarrow.parquet as pq
work, q = sys.argv[1:3]
# pick a part file that actually has rows — natural-partitioning dumps
# (SPARK_GRAFT_COALESCE=0) can emit empty part files
f = next((p for p in sorted(glob.glob(f"{work}/{q}/*.parquet"))
          if pq.ParquetFile(p).metadata.num_rows > 0), None)
if f is None:
    sys.exit(f"[selftest] FATAL: no non-empty parquet file to corrupt in {q}")
t = pq.read_table(f)
# Per-type perturbation over the FIRST corruptible column — a query whose
# last column is a string/date must still exercise the gate, not crash.
idx = None
for i, field in enumerate(t.schema):
    ty = field.type
    if (pa.types.is_integer(ty) or pa.types.is_floating(ty)
            or pa.types.is_string(ty) or pa.types.is_large_string(ty)):
        idx = i
        break
if idx is None:
    sys.exit(f"[selftest] FATAL: no numeric/string column to corrupt in {q}")
col = t.column_names[idx]
ty = t.schema.field(idx).type
vals = t[col].to_pylist()
if pa.types.is_string(ty) or pa.types.is_large_string(ty):
    vals[0] = (vals[0] or "") + "\x01corrupt"
else:
    vals[0] = (vals[0] or 0) + 1
pq.write_table(t.set_column(idx, col, pa.array(vals, type=ty)), f)
print(f"[selftest] corrupted one value in {col}")
EOF
echo "[selftest] corrupted copy must FAIL"
if python3 "$(dirname "$0")/check_oracle_json.py" "$sfdir" "$work" "$work/bad.json" 120; then
  echo "[selftest] FATAL: checker accepted corrupted data" >&2
  exit 1
fi
echo "[selftest] OK: gate is live (clean passes, corruption fails)"
