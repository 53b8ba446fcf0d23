#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: verify_local.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify), replays
<outDir>/oracle_sql.json in DuckDB against views named after the
tables in <sfDir>, and diffs values (columns sorted by name, rows
sorted) — mirroring the driver's compare.
"""
import duckdb, glob, json, math, os, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    got_path = f"{outdir}/{name}"
    if not os.path.isdir(got_path):
        print(f"FAIL {name}: no spark output at {got_path}")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{got_path}/*.parquet')").fetchdf()
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: schema {gcols} vs {ecols}")
        fails += 1
        continue
    # Dtype gate: the driver's hash is dtype-sensitive (int64 5 !=
    # float64 5.0 — e.g. DuckDB SUM(int) returns HUGEINT which pandas
    # renders float64). Fail on type-class drift per column so this
    # local gate is at least as strict as the driver's compare.
    def tclass(dt):
        k = dt.kind
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "timestamp", "m": "interval"}.get(k, "obj")
    drift = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gcols
             if tclass(got[c].dtype) != tclass(exp[c].dtype)]
    if drift:
        print(f"FAIL {name}: dtype drift {drift}")
        fails += 1
        continue
    # Normalize to Python scalars so both sides sort under identical
    # keys (int32 vs int64 / numpy repr differences would otherwise
    # order rows differently and produce spurious mismatches).
    def norm(df, cols):
        return [tuple(x.item() if hasattr(x, "item") else x for x in row)
                for row in df[cols].itertuples(index=False)]
    g = sorted(norm(got, gcols), key=repr)
    e = sorted(norm(exp, ecols), key=repr)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
        fails += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(g, e)):
        if repr(a) != repr(b):
            eq = all(
                (x == y) or (isinstance(x, float) and isinstance(y, float)
                             and (math.isnan(x) and math.isnan(y) or x == y))
                for x, y in zip(a, b))
            if not eq:
                bad = (i, a, b)
                break
    if bad:
        print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  duckdb: {bad[2]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
