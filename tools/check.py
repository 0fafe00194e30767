#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracles.

Usage: python tools/check.py <sfDir> <outDir>
Runs each oracle_sql.json query in DuckDB with views over <sfDir>/*.parquet,
loads the matching Spark result parquet from <outDir>/<name>/, sorts both by
all columns (column order = sorted names), and compares with per-cell
tolerance for floats. This is a *local pre-check only* (the real driver has
its own comparator); not part of the shipped library.
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    """Exact, type-tagged normalization mirroring the driver's hash: the
    driver serializes types AND bitwise values, so the local gate must too
    (Python == coerces 1 == 1.0 == Decimal(1), which hid 3 driver failures
    in round 1). Floats are repr'd bit-exactly; NaN gets a stable sentinel."""
    if isinstance(v, float):
        return ("float", "nan") if math.isnan(v) else ("float", repr(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, norm(x)) for k, x in v.items())))
    return (type(v).__name__, repr(v))

def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
    cols = sorted(spark_cols)
    s_ix = [spark_cols.index(c) for c in cols]
    d_ix = [duck_cols.index(c) for c in cols]
    # Exact normalized values sort identically on both sides, so row
    # alignment cannot drift (the old rounded-repr sort could misalign rows
    # that straddled a rounding boundary).
    s = sorted([tuple(norm(r[i]) for i in s_ix) for r in spark_rows])
    d = sorted([tuple(norm(r[i]) for i in d_ix) for r in duck_rows])
    for i, (a, b) in enumerate(zip(s, d)):
        for c, (x, y) in enumerate(zip(a, b)):
            if x != y:
                return f"VALUE MISMATCH row {i} col {cols[c]}: spark={x!r} duck={y!r}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted([os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(d)])
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        spark_rows, spark_cols = rel.fetchall(), rel.columns
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_rows)} rows) " +
                  ("OK" if len(spark_rows) > 0 else "EMPTY!"))
            n_noracle += 1
            continue
        try:
            orel = con.sql(oracles[name])
            duck_rows, duck_cols = orel.fetchall(), orel.columns
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        err = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if err:
            print(f"  {name}: FAIL {err}"); n_fail += 1
        else:
            print(f"  {name}: OK ({len(spark_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
