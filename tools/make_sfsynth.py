#!/usr/bin/env python3
"""Synthesize a 10x-scale testdata dir from an existing sf dir (dev-only).

Facts are replicated 10x with shifted primary keys so joins stay valid and
per-user/per-doc structure replicates rather than interleaves:

  - orders/lineitem: o_orderkey/l_orderkey shifted per replica (FK pairs move
    together; o_custkey etc. stay in the copied dims' key range)
  - events: event_id AND user_id shifted (disjoint per-replica user
    timelines — sessions/windows/gaps replicate instead of merging)
  - documents/embeddings: doc_id/vec_id shifted (duplicate-cluster structure
    replicates 10x)
  - region/nation/customer/supplier/part: copied as-is
  - events.ts column type is preserved verbatim (the loaders' two-flavor
    contract is part of what the synthetic sweep must exercise)

Usage: python3 tools/make_sfsynth.py [src_sf_dir] [dst_dir] [reps]

reps defaults to 10 (one decade). reps=100 from sf0.1 gives the 100x
fixture (sfsynth10): the existing key shifts hold because every shifted
base key is below its shift (orderkey < 1M, event/user id < 1M,
doc/vec id < 100k at sf0.1), so 100 replicas stay disjoint.
Then:  sbt "runMain graft.Verify <dst_dir> /tmp/verify_sf1"
       python3 tools/check.py <dst_dir> /tmp/verify_sf1

The round-3 sweep at this scale caught a tie-nondeterministic oracle
(st_sessionize) that sf0.1 was too small to expose; run it once per round
after the sf0.1 gate is green.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfsynth1'
nreps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

for t in ['region', 'nation', 'customer', 'supplier', 'part']:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")


def replicate(table, shifts, reps=10):
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')").fetchall()]
    sel = ', '.join(
        f"t.{c} + r.r*{shifts[c]} AS {c}" if c in shifts else f"t.{c}" for c in cols)
    con.execute(f"""COPY (
      SELECT {sel}
      FROM read_parquet('{src}/{table}.parquet') t,
           (SELECT unnest(range({reps})) AS r) r
    ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(table, n)


replicate('orders', {'o_orderkey': 1000000}, reps=nreps)
replicate('lineitem', {'l_orderkey': 1000000}, reps=nreps)
replicate('events', {'event_id': 1000000, 'user_id': 1000000}, reps=nreps)
replicate('documents', {'doc_id': 100000}, reps=nreps)
replicate('embeddings', {'vec_id': 100000}, reps=nreps)
