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

--extend-span changes the density model: by default every copy shares
the source's time axis and text content, so per-instant interval
density and cross-copy near-dup groups grow with REPS — which makes
the interval sweeps (q_interval_overlap, q_peak_concurrency) and the
banding dedups LOOK super-linear even when they scale with work. With
the flag, copy i additionally:
  * shifts events.ts by i * (source span + 1h) — constant events/sec;
  * shifts o_orderdate and l_shipdate by i * (source day span + 1) —
    the SAME day offset for both tables, so within-copy date
    relationships are untouched (note: absolute date-literal
    predicates then select only copy 0 — this mode is for measuring
    the density-sensitive operators, not the TPC-H literal filters);
  * renames every \\w+ token in documents.text with an 'r{i}' suffix —
    a bijection on the token vocabulary, so each copy's INTERNAL
    shingle/jaccard/minhash structure is exactly the source's while
    cross-copy similarity drops to ~0 (n_chars is recomputed).
Engine-vs-oracle hash-exactness is unaffected either way (both read
the same parquet); the flag exists so the sf~10 SCALING measurement
reflects constant density, the way a real 100 TB corpus grows.

Usage:
  python3 tools/make_sf1.py [src_dir] [dst_dir] [reps] [--extend-span]
  # defaults: /root/testdata/sf0.1 /tmp/sf1_synth 10
"""
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--extend-span"]
EXTEND_SPAN = "--extend-span" in sys.argv[1:]
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
DST = args[1] if len(args) > 1 else "/tmp/sf1_synth"
REPS = int(args[2]) if len(args) > 2 else 10

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

    # per-copy span shifts (only used with --extend-span)
    span_sql = {}
    if EXTEND_SPAN:
        ts_span_us = con.execute(
            f"SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + 3600000000 "
            f"FROM '{SRC}/events.parquet'").fetchone()[0]
        day_span = con.execute(
            f"SELECT greatest("
            f" (SELECT date_diff('day', min(o_orderdate), max(o_orderdate))"
            f"    FROM '{SRC}/orders.parquet'),"
            f" (SELECT date_diff('day', min(l_shipdate), max(l_shipdate))"
            f"    FROM '{SRC}/lineitem.parquet')) + 1").fetchone()[0]
        print(f"extend-span: ts +{ts_span_us}us/copy, dates +{day_span}d/copy")
        span_sql = {
            "ts": f"ts + to_microseconds(i * {int(ts_span_us)}) AS ts",
            # o_orderdate / l_shipdate are physically TIMESTAMPs —
            # add whole days as an interval (type-preserving)
            "o_orderdate":
                f"o_orderdate + to_days(CAST(i * {int(day_span)} AS INTEGER))"
                f" AS o_orderdate",
            "l_shipdate":
                f"l_shipdate + to_days(CAST(i * {int(day_span)} AS INTEGER))"
                f" AS l_shipdate",
            "text": r"regexp_replace(text, '(\w+)',"
                    r" '\1r' || CAST(i AS VARCHAR), 'g') AS text",
            "n_chars": r"CAST(length(regexp_replace(text, '(\w+)',"
                       r" '\1r' || CAST(i AS VARCHAR), 'g')) AS BIGINT)"
                       r" AS n_chars",
        }

    for t in SHARED_DIMS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as shared dim")

    for t, cols in TABLES.items():
        sel = ", ".join(
            f"{c} + i * {strides[d]} AS {c}" if d
            else span_sql.get(c, c) for c, d in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({REPS})) AS i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({REPS}x)")


if __name__ == "__main__":
    main()
