#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the engine
itself is pure Scala/Spark). Runs Verify's parquet outputs against the DuckDB
oracle SQL and reports per-query row/schema/value match.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def norm(v):
        if v is None:
            return (0, "")
        if isinstance(v, float):
            if math.isnan(v):
                return (1, "NaN")
            # mirror a value-hash: repr at full precision
            return (1, repr(v))
        if isinstance(v, (list, tuple)):
            return (1, tuple(norm(x) for x in v))
        return (1, str(v))
    return sorted(tuple(norm(v) for v in r) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(set(oracle) | {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)})
    for name in names:
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); continue
        got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"OK?  {name}: rows-only ({len(got_rows)} rows, no oracle)")
            n_ok += 1
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); continue
        # driver sorts columns by name before hashing
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}"); continue
        g = canon([[r[i] for i in gi] for r in got_rows])
        e = canon([[r[i] for i in ei] for r in exp_rows])
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}"); continue
        if g != e:
            bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark={g[bad]}\n  duck ={e[bad]}")
            continue
        print(f"OK   {name}: {len(g)} rows hash-match")
        n_ok += 1
    print(f"\n{n_ok}/{len(names)} pass")
    return 0 if n_ok == len(names) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
