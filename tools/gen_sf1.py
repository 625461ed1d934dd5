#!/usr/bin/env python3
"""Build an sf1-scale magnitude-sweep dataset from the driver's sf0.1 parquet.

Purpose (round-10 verdict item 4): the q194-class failure mode — int64 /
double magnitude bugs that only appear a DECADE of scale above the gate SF —
needs a 6M-row lineitem to surface. The driver only ships sf<=0.1, so this
tool replicates the TPC-H tables 10x with PER-COPY KEY OFFSETS (copy i adds
i * 2^ceil(log2(max_key+1)) to every key column, preserving all FK
relationships inside each copy and keeping keys globally unique so id
tie-breaks stay deterministic). Dates, dims (nation/region), and the
documents/embeddings/events tables are copied verbatim — the magnitude
hazard under test lives in the big-table aggregations, and duplicating
event/doc rows would instead create (user, ts) ties with engine-dependent
window order.

Output: /tmp/sf1/*.parquet, same schemas. Driver-side python3+duckdb only
(test tooling, like check_oracle.py). Usage: python3 tools/gen_sf1.py [out].
"""
import math
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10


def pow2_above(v: int) -> int:
    return 1 << (v.bit_length())


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    offs = {}
    for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey")]:
        mx = con.execute(f"SELECT MAX({k}) FROM {src(t)}").fetchone()[0]
        offs[t] = pow2_above(int(mx))
    print("key offsets:", offs)

    def scale(table: str, key_exprs: dict) -> None:
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM {src(table)}").fetchall()]
        sel = ", ".join(key_exprs.get(c, c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM {src(table)} CROSS JOIN "
            f"(SELECT UNNEST(range({COPIES})) AS cp) "
            f"ORDER BY cp) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    scale("customer", {"c_custkey": f"c_custkey + cp * {offs['customer']} AS c_custkey"})
    scale("supplier", {"s_suppkey": f"s_suppkey + cp * {offs['supplier']} AS s_suppkey"})
    scale("part", {"p_partkey": f"p_partkey + cp * {offs['part']} AS p_partkey"})
    scale("orders", {
        "o_orderkey": f"o_orderkey + cp * {offs['orders']} AS o_orderkey",
        "o_custkey": f"o_custkey + cp * {offs['customer']} AS o_custkey"})
    scale("lineitem", {
        "l_orderkey": f"l_orderkey + cp * {offs['orders']} AS l_orderkey",
        "l_partkey": f"l_partkey + cp * {offs['part']} AS l_partkey",
        "l_suppkey": f"l_suppkey + cp * {offs['supplier']} AS l_suppkey"})

    for t in ["region", "nation", "events", "documents", "embeddings"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied verbatim")


if __name__ == "__main__":
    main()
