#!/usr/bin/env python3
"""Dev gate for the star-edge cluster generator (round 7): proves that the
registered dd_simhash_clusters output (Verify parquet — produced by the
verified-spanning-subset generator Banding.hammingStarEdges + clustersOf)
EQUALS min-label connected components computed by an independent union-find
over the FULL dd_simhash pair list, at whatever scale the Verify dump was
taken (run it on the sf1 synthetic dump, where the DuckDB recursive-CTE
oracle times out).

Usage: python3 tools/check_star_clusters.py <verifyOutDir>
"""
import sys

import duckdb


def main(out_dir):
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT id_a, id_b FROM '{out_dir}/dd_simhash/*.parquet'").fetchall()
    got = dict(con.execute(
        f"SELECT doc_id, cluster_id FROM '{out_dir}/dd_simhash_clusters/*.parquet'"
    ).fetchall())
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
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    want = {n: find(n) for n in parent}
    if got == want:
        n_clusters = len(set(want.values()))
        print(f"OK   dd_simhash_clusters == union-find over {len(pairs)} pairs "
              f"({len(want)} docs, {n_clusters} clusters)")
        return 0
    missing = set(want) ^ set(got)
    diff = [n for n in set(want) & set(got) if want[n] != got[n]]
    print(f"FAIL node-set diff {len(missing)}, label diff {len(diff)} "
          f"(e.g. {diff[:5]})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
