#!/usr/bin/env python3
"""Big-sweep variant of check.py (dev tool): each oracle runs in its OWN
subprocess with a timeout, retried once with `PRAGMA threads=1` — DuckDB's
multithreaded IE_JOIN can livelock on large×tiny LEFT range joins (the
geo_ip_range hazard documented in the verify skill) and an in-process
interrupt() does not break it; a subprocess kill does.

The connected-component rows (COMPONENT_ROWS) get a designated ALTERNATE
oracle when the standard one times out: DuckDB's recursive `reach` CTE is
the only construct in those oracles that cannot scale past ~10^7 edges
(label propagation materializes O(nodes x component-size) rows; the
documented round-6/7 gap at sfsynth1). Everything BEFORE the recursion is
plain relational SQL, so the fallback strips the recursive CTE, fetches
the edge list from DuckDB, and takes min-label connected components with
a union-find (union-by-min keeps the invariant root == min id of the
component — exactly the label the recursive oracle computes). Same
independence guarantee: signatures/bands/pairs all come from DuckDB's
replay, only the transitive closure moves to the checker.

Usage: python3 tools/check_big.py <sfDir> <verifyOutDir> [timeout_s]
       python3 tools/check_big.py --one <name> <threads> <sfDir> <outDir>
       python3 tools/check_big.py --uf <name> <threads> <sfDir> <outDir>
"""
import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from check import TABLES, canon_df  # noqa: E402

# rows whose oracle is `<relational CTEs> + recursive reach + min(lbl)`
COMPONENT_ROWS = {"dd_clusters", "dd_simhash_clusters", "mm_phash_clusters"}
REACH_MARKER = "reach(node, lbl) AS"


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


def run_union_find(name, threads, sf_dir, out_dir):
    """Alternate oracle for COMPONENT_ROWS: DuckDB replays everything up
    to the edge list, the transitive closure runs as a union-find."""
    import duckdb
    con = duckdb.connect()
    if threads:
        con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    if REACH_MARKER not in sql:
        print(f"FAIL {name}: oracle lost its recursive-reach shape"); return 1
    prefix = sql[:sql.index(REACH_MARKER)].rstrip().rstrip(",")
    pairs = con.execute(prefix + "\nSELECT id_a, id_b FROM edges").fetchall()
    got_df = con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    if sorted(got_df.columns) != ["cluster_id", "doc_id"]:
        print(f"FAIL {name}: columns {sorted(got_df.columns)}"); return 1
    # dict(zip(...)) silently collapses duplicate doc_id rows — an output
    # with duplicated (or conflicting) cluster rows must fail here exactly
    # as the primary full-frame compare would fail it
    got = dict(zip(got_df["doc_id"], got_df["cluster_id"]))
    if len(got_df) != len(got):
        print(f"FAIL {name}: {len(got_df) - len(got)} duplicate doc_id rows "
              f"in engine output ({len(got_df)} rows, {len(got)} distinct)")
        return 1
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent.get(r, r)
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union-by-min: roots only ever decrease, so the final root of
            # every node is the min id of its component — the same label
            # the recursive oracle's min(lbl) computes
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    want = {n: find(n) for n in parent}
    if got == want:
        print(f"OK   {name}: {len(want)} rows union-find-match "
              f"({len(pairs)} edges, {len(set(want.values()))} clusters)")
        return 0
    missing = set(want) ^ set(got)
    diff = [n for n in set(want) & set(got) if want[n] != got[n]]
    print(f"FAIL {name}: node-set diff {len(missing)}, label diff "
          f"{len(diff)} (e.g. {sorted(diff)[:5]})")
    return 1


def main(sf_dir, out_dir, timeout_s):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set(oracle) |
                   {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)})
    n_ok = 0
    for name in names:
        ok = False
        # component rows go straight to union-find after the FIRST timeout:
        # the recursive reach CTE is the scale limit, retrying it slower
        # single-threaded only burns the budget (round-7 lesson at 11M edges)
        attempts = [("--one", 0, timeout_s), ("--one", 1, timeout_s * 4)]
        if name in COMPONENT_ROWS:
            attempts = [("--one", 0, timeout_s),
                        ("--uf", 0, timeout_s * 4), ("--uf", 1, timeout_s * 4)]
        for mode, threads, tmo in attempts:
            cmd = [sys.executable, os.path.abspath(__file__), mode, name,
                   str(threads), sf_dir, out_dir]
            try:
                r = subprocess.run(cmd, timeout=tmo)
                if r.returncode == 0:
                    ok = True
                    break
                # a hard oracle ERROR is final; only timeouts escalate
                break
            except subprocess.TimeoutExpired:
                print(f"...  {name}: {mode} timed out at "
                      f"threads={threads or 'default'}, escalating")
        if ok:
            n_ok += 1
        else:
            print(f"FAIL {name}")
    print(f"\n{n_ok}/{len(names)} pass")
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]))
    if sys.argv[1] == "--uf":
        sys.exit(run_union_find(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 120))
