#!/usr/bin/env python3
"""Generate the synthetic sf~1 (10x) verification dataset.

Replicates an input scale-factor directory REPS times with consistent
id offsets per key domain: every copy i shifts each key domain's ids
by i * stride where stride = max(key) + 1 over the source table, so
foreign keys stay consistent across tables (copy i's lineitems point
at copy i's orders/parts/suppliers, copy i's orders at copy i's
customers, etc.). nation/region stay shared dims (they are bounded
dimensions in the reference schema; replicating them would change
join semantics).

This is the dataset behind the 10x oracle sweeps recorded in TESTS.md:
value distributions, text, embeddings and timestamps are bit-identical
per copy, so any engine/oracle divergence surfaced at 10x is a real
scale bug (partition-boundary sampling, shared-name grouping,
overflow), not generator noise. Deterministic: no randomness anywhere.

Usage:
  python3 tools/make_sf1.py [src_dir] [dst_dir] [reps]
  # defaults: /root/testdata/sf0.1 /tmp/sf1_synth 10
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> list of (column, key_domain or None). Key domains are
# shared across tables so strides agree between fact and dim copies.
TABLES = {
    "customer": [("c_custkey", "custkey"), ("c_name", None),
                 ("c_nationkey", None), ("c_acctbal", None),
                 ("c_mktsegment", None)],
    "supplier": [("s_suppkey", "suppkey"), ("s_name", None),
                 ("s_nationkey", None), ("s_acctbal", None)],
    "part": [("p_partkey", "partkey"), ("p_name", None), ("p_brand", None),
             ("p_type", None), ("p_size", None), ("p_retailprice", None)],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey"),
               ("o_orderstatus", None), ("o_totalprice", None),
               ("o_orderdate", None), ("o_orderpriority", None)],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey"), ("l_linenumber", None),
                 ("l_quantity", None), ("l_extendedprice", None),
                 ("l_discount", None), ("l_tax", None),
                 ("l_returnflag", None), ("l_linestatus", None),
                 ("l_shipdate", None)],
    "events": [("event_id", "event_id"), ("ts", None),
               ("user_id", "user_id"), ("event_type", None),
               ("value", None), ("props", None)],
    "documents": [("doc_id", "doc_id"), ("text", None), ("lang", None),
                  ("source", None), ("n_chars", None)],
    "embeddings": [("vec_id", "vec_id"), ("embedding", None),
                   ("label", None)],
}
SHARED_DIMS = ["region", "nation"]


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    # stride per key domain = max over every table carrying it, + 1
    # (paranoia: a dangling fk larger than the dim's max id must not
    # collide with the next copy)
    strides = {}
    for t, cols in TABLES.items():
        for col, dom in cols:
            if dom is None:
                continue
            m = con.execute(
                f"SELECT max({col}) FROM '{SRC}/{t}.parquet'").fetchone()[0]
            strides[dom] = max(strides.get(dom, 0), int(m) + 1)
    print("strides:", strides)

    for t in SHARED_DIMS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as shared dim")

    for t, cols in TABLES.items():
        sel = ", ".join(
            f"{c} + i * {strides[d]} AS {c}" if d else c for c, d in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({REPS})) AS i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({REPS}x)")


if __name__ == "__main__":
    main()
