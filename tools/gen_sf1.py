#!/usr/bin/env python3
"""Regenerate the /tmp/graft_sf1 bench corpus (BENCH_SF1.md recipe).

Structure-preserving 10x blowup of /root/testdata/sf0.1: ten disjoint
key-offset replicas of every fact table (offset i*10^8 on the key columns),
tiny dims (region, nation) single-copy with foreign keys untouched so
broadcast-join shapes survive. Join keys match only within a replica, so
join output cardinality scales linearly — like real TPC-H sf growth.

Driver-side tooling only (duckdb) — not part of the shipped library.
Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [replicas]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 10 ** 8

# table -> columns to offset per replica (facts); [] -> copy as-is (dims)
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for tbl, keys in KEYS.items():
        src = f"{SRC}/{tbl}.parquet"
        dst = f"{DST}/{tbl}.parquet"
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)")
        else:
            cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
            parts = []
            for i in range(REPLICAS):
                sel = ", ".join(
                    f"{c} + {i * OFFSET} AS {c}" if c in keys else c for c in cols)
                parts.append(f"SELECT {sel} FROM read_parquet('{src}')")
            con.execute(
                f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
