#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the engine
itself is pure Scala/Spark). Runs Verify's parquet outputs against the DuckDB
oracle SQL and reports per-query row/schema/value match.

Mirrors the driver's compare path faithfully: both sides go through pandas
(so DuckDB HUGEINT degrades to float64 exactly like the driver sees it, and
array columns crash sort_values exactly like the driver's harness does),
columns are sorted by name, rows are sorted by all columns, and values are
compared stringified.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_df(df):
    """Driver-shaped canonicalization: sort columns by name, sort rows by all
    columns (raises on unhashable cells, as the driver does), stringify.
    NaN and None get DISTINCT markers: a query producing IEEE NaN on one
    engine and SQL NULL on the other is a real semantic difference (e.g.
    x/0 is NULL in Spark SQL, NaN in DuckDB) and must FAIL here, not pass."""
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return [tuple("NULL" if v is None
                  else "NaN" if isinstance(v, float) and v != v
                  else str(v) for v in row)
            for row in df.itertuples(index=False, name=None)]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(set(oracle) | {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)})
    if only:
        names = [n for n in names if n in only]
    for name in names:
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); continue
        try:
            got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); continue
        if name not in oracle:
            print(f"OK?  {name}: rows-only ({len(got)} rows, no oracle)")
            n_ok += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"); continue
        try:
            g = canon_df(got)
        except Exception as e:
            print(f"FAIL {name}: spark side uncomparable (driver would crash): {e}"); continue
        try:
            e_ = canon_df(exp)
        except Exception as e:
            print(f"FAIL {name}: oracle side uncomparable (driver would crash): {e}"); continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e_)}"); continue
        if g != e_:
            bad = next(i for i, (a, b) in enumerate(zip(g, e_)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark={g[bad]}\n  duck ={e_[bad]}")
            continue
        print(f"OK   {name}: {len(g)} rows hash-match")
        n_ok += 1
    print(f"\n{n_ok}/{len(names)} pass")
    return 0 if n_ok == len(names) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
