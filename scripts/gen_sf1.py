#!/usr/bin/env python3
"""Dev-only generator for the /tmp/sf1 10x-replica fixture (FIXTURES.md §4).

Replicates the sf0.1 FACT tables 10x with key offsets (identity keys
shifted per replica so every row is key-unique; foreign keys into the
non-replicated dimensions are left untouched so every join stays valid)
and copies the dimension tables as-is. This reproduces the sf~1 full-gate
dataset shape: 6M lineitem, 1.5M orders, 1M events, 50k documents, 20k
embeddings.

CAVEAT (SCALE.md §9): replication multiplies TRUE duplicate pairs ~100x —
use /tmp/sf1 for oracle gates, NOT for dedup/ANN scaling ratios (that is
what the non-replicated GenScaledCorpus series is for).

Usage: python3 scripts/gen_sf1.py [src_sf_dir] [out_dir] [replicas]
       defaults: /root/testdata/sf0.1 /tmp/sf1 10
Driver-side-only tooling (duckdb); not part of the shipped library.
"""
import os
import sys

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table -> columns receiving the per-replica key offset
FACT_OFFSET_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],          # keeps the orders join consistent
    "events": ["event_id", "user_id"],   # user-keyed ops keep 10x users
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, keys in FACT_OFFSET_KEYS.items():
        # one offset decade per table: next power of 10 above the max key,
        # so replica keys never collide and stay readable
        maxk = con.execute(
            f"SELECT max(greatest({', '.join(keys)})) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
        off = 10
        while off <= maxk:
            off *= 10
        selects = []
        for r in range(replicas):
            cols = ", ".join(
                f"({k} + {r * off}) AS {k}" if k in keys else k
                for k in [c[0] for c in con.execute(
                    f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()])
            selects.append(f"SELECT {cols} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {replicas}x replicated, offset={off}, rows={n}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, out, reps)
