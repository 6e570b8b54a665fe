#!/usr/bin/env python3
"""Big-sweep variant of check.py (dev tool): each oracle runs in its OWN
subprocess with a timeout, retried once with `PRAGMA threads=1` — DuckDB's
multithreaded IE_JOIN can livelock on large×tiny LEFT range joins (the
geo_ip_range hazard documented in the verify skill) and an in-process
interrupt() does not break it; a subprocess kill does.

Usage: python3 tools/check_big.py <sfDir> <verifyOutDir> [timeout_s]
       python3 tools/check_big.py --one <name> <threads> <sfDir> <outDir>
"""
import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from check import TABLES, canon_df  # noqa: E402


def run_one(name, threads, sf_dir, out_dir):
    import duckdb
    con = duckdb.connect()
    if threads:
        con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); return 1
    got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    if name not in oracle:
        print(f"OK?  {name}: rows-only ({len(got)} rows, no oracle)")
        return 0
    exp = con.execute(oracle[name]).df()
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return 1
    try:
        g = canon_df(got)
    except Exception as e:
        print(f"FAIL {name}: spark side uncomparable (driver would crash): {e}")
        return 1
    try:
        e_ = canon_df(exp)
    except Exception as e:
        print(f"FAIL {name}: oracle side uncomparable (driver would crash): {e}")
        return 1
    if len(g) != len(e_):
        print(f"FAIL {name}: {len(g)} rows vs oracle {len(e_)}")
        return 1
    if g != e_:
        bad = next(i for i, (a, b) in enumerate(zip(g, e_)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  got {g[bad]}\n  exp {e_[bad]}")
        return 1
    print(f"OK   {name}: {len(g)} rows hash-match")
    return 0


def main(sf_dir, out_dir, timeout_s):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set(oracle) |
                   {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)})
    n_ok = 0
    for name in names:
        ok = False
        for threads, tmo in ((0, timeout_s), (1, timeout_s * 4)):
            cmd = [sys.executable, os.path.abspath(__file__), "--one", name,
                   str(threads), sf_dir, out_dir]
            try:
                r = subprocess.run(cmd, timeout=tmo)
                ok = r.returncode == 0
                break
            except subprocess.TimeoutExpired:
                print(f"...  {name}: timed out at threads={threads or 'default'}, "
                      f"{'retrying single-threaded' if threads == 0 else 'giving up'}")
        if ok:
            n_ok += 1
        else:
            print(f"FAIL {name}")
    print(f"\n{n_ok}/{len(names)} pass")
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 120))
