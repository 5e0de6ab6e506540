#!/usr/bin/env python3
"""Generate degenerate-corpus variants for the cross-engine oracle gate.

The 10x replication sweep (make_sf1.py) only inflates density — it can
never produce the input classes where Spark and DuckDB render results
DIFFERENTLY for the same SQL: empty inputs, 1-row inputs (n-1 = 0
divisors), all-equal values (every rank/percentile boundary is a tie),
one-hot key skew, unicode extremes (normalization/segmentation), and
zero vectors (0/0 cosines). Those are exactly the traps found by hand
in earlier rounds (NULL-vs-inf, NULL sort order, truncate-vs-round);
this generator makes that class mechanical: run graft.Verify +
tools/check.py on each variant dir and every divergence is a real bug.

Variants (each a full 10-table directory, schemas identical to
/root/testdata/sf*, deterministic, no randomness):

  empty    every table 0 rows
  onerow   every table exactly 1 row, FK-consistent
  ties     all-equal values / single group / one-hot key skew:
           one event_type, 99% of events on one user, every value
           identical; all documents the same text; all embeddings the
           same vector; lineitem quantities/dates/flags all equal
  unicode  text columns exercise emoji, CJK, RTL, combining marks,
           zero-width joiners, newlines, quotes, backslashes, NUL-free
           control chars and 4-byte astral plane codepoints
  zerovec  embeddings mix zero vectors, tiny (1e-8) and large (1e2)
           magnitudes — every norm division meets a 0 and a subnormal
           neighborhood

Usage: python3 tools/make_degenerate.py [dst_root]
       # default /tmp/graft_degenerate -> <dst_root>/<variant>/*.parquet
"""
import sys
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_degenerate"

SCHEMAS = {
    "region": [("r_regionkey", pa.int32()), ("r_name", pa.string())],
    "nation": [("n_nationkey", pa.int32()), ("n_name", pa.string()),
               ("n_regionkey", pa.int32())],
    "customer": [("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())],
    "supplier": [("s_suppkey", pa.int64()), ("s_name", pa.string()),
                 ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())],
    "part": [("p_partkey", pa.int64()), ("p_name", pa.string()),
             ("p_brand", pa.string()), ("p_type", pa.string()),
             ("p_size", pa.int32()), ("p_retailprice", pa.float64())],
    "orders": [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
               ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
               ("o_orderdate", pa.timestamp("us")),
               ("o_orderpriority", pa.string())],
    "lineitem": [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                 ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                 ("l_quantity", pa.float64()),
                 ("l_extendedprice", pa.float64()),
                 ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                 ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                 ("l_shipdate", pa.timestamp("us"))],
    "events": [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
               ("user_id", pa.int64()), ("event_type", pa.string()),
               ("value", pa.float64()), ("props", pa.string())],
    "documents": [("doc_id", pa.int64()), ("text", pa.string()),
                  ("lang", pa.string()), ("source", pa.string()),
                  ("n_chars", pa.int64())],
    "embeddings": [("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())],
}

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
DIM = 64


def write(variant, table, rows):
    import os
    d = f"{DST}/{variant}"
    os.makedirs(d, exist_ok=True)
    schema = pa.schema(SCHEMAS[table])
    cols = list(zip(*rows)) if rows else [[] for _ in SCHEMAS[table]]
    arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)]
    pq.write_table(pa.table(dict(zip([f.name for f in schema], arrays)),
                            schema=schema),
                   f"{d}/{table}.parquet")


def ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def base_dims(variant):
    """Shared 1-row dims for every non-empty variant."""
    write(variant, "region", [(0, "AMERICA")])
    write(variant, "nation", [(0, "BRAZIL", 0)])


def gen_empty():
    for t in SCHEMAS:
        write("empty", t, [])


def gen_onerow():
    v = "onerow"
    base_dims(v)
    write(v, "customer", [(0, "cust0", 0, 10.0, "BUILDING")])
    write(v, "supplier", [(0, "supp0", 0, 5.0)])
    write(v, "part", [(0, "green part", "B#1", "SMALL BRASS", 1, 100.0)])
    write(v, "orders", [(0, 0, "O", 100.0, ts(0), "1-URGENT")])
    write(v, "lineitem", [(0, 0, 0, 1, 1.0, 100.0, 0.05, 0.02,
                           "N", "O", ts(60))])
    write(v, "events", [(0, ts(0), 0, "click", 1.5, '{"k": 1}')])
    write(v, "documents", [(0, "one single document", "en", "src0", 19)])
    write(v, "embeddings", [(0, [0.1] * DIM, 0)])


def gen_ties():
    v = "ties"
    base_dims(v)
    n = 40
    write(v, "customer",
          [(i, "samename", 0, 7.0, "BUILDING") for i in range(n)])
    write(v, "supplier", [(i, "samename", 0, 7.0) for i in range(n)])
    write(v, "part",
          [(i, "same part name", "B#1", "SMALL BRASS", 5, 7.0)
           for i in range(n)])
    # every order: same customer, same date, same price, same status
    write(v, "orders",
          [(i, 0, "O", 7.0, ts(0), "1-URGENT") for i in range(n)])
    # every lineitem identical apart from keys; all on order 0's date
    write(v, "lineitem",
          [(i % n, i % n, i % n, 1, 7.0, 7.0, 0.05, 0.02, "N", "O", ts(0))
           for i in range(3 * n)])
    # one event_type, one value, 99% of events on user 0, one timestamp
    # tick shared by almost everything (window/session boundary ties)
    write(v, "events",
          [(i, ts(0 if i % 50 else i), 0 if i % 100 else 1, "click",
            7.0, '{"k": 1}') for i in range(200)])
    write(v, "documents",
          [(i, "the same text in every document row", "en", "src0", 37)
           for i in range(20)])
    write(v, "embeddings", [(i, [0.125] * DIM, 0) for i in range(20)])


def gen_unicode():
    v = "unicode"
    base_dims(v)
    texts = [
        "café naïve résumé jalapeño",      # latin-1 accents
        "café naïve résumé (decomposed)",     # combining marks
        "日本語の文書 中文文档 한국어 문서",  # CJK+Hangul
        "مرحبا بالعالم rtl text",  # Arabic RTL
        "emoji \U0001f600\U0001f680\U0001f9e0 astral \U00010348 plane",  # 4-byte
        "zero​width‍joined⁠words",                     # ZWSP/ZWJ/WJ
        "quotes \" ' `` backslash \\ tab\tnewline\nend",              # escapes
        "controlcharsbelldone",                     # C0 controls
        "UPPER lower MiXeD İstanbul straße",                # casefold traps
        "",                                                            # empty doc
        " \t\n  ",                                                     # whitespace-only
        "a",                                                           # 1-char
    ]
    write(v, "documents",
          [(i, t, ["en", "ja", "ar", "zz"][i % 4], f"src{i % 3}", len(t))
           for i, t in enumerate(texts)])
    # events with unicode event types and json-escaped props
    write(v, "events",
          [(i, ts(i), i % 5, ["click", "クリック",
                              "café", "\U0001f600"][i % 4],
            float(i), '{"k": "é\U0001f600"}') for i in range(40)])
    # unicode dims and tpch tables, small but non-trivial
    write(v, "customer",
          [(i, f"Kundé {i}\U0001f600", 0, float(i), "BUILDING")
           for i in range(8)])
    write(v, "supplier", [(i, f"Líeferant {i}", 0, float(i))
                          for i in range(8)])
    write(v, "part",
          [(i, f"grün 部品 {i}", "B#1", "SMALL BRASS",
            i % 3 + 1, 10.0 + i) for i in range(8)])
    write(v, "orders", [(i, i % 8, "O", 10.0 + i, ts(i * 1440), "1-URGENT")
                        for i in range(16)])
    write(v, "lineitem",
          [(i % 16, i % 8, i % 8, i // 16 + 1, 1.0 + i % 5, 10.0 + i,
            0.05, 0.02, "N", "O", ts(i * 720)) for i in range(32)])
    write(v, "embeddings", [(i, [0.1 * ((i + j) % 5 - 2) for j in range(DIM)],
                             i % 3) for i in range(12)])


def gen_zerovec():
    v = "zerovec"
    base_dims(v)
    # minimal relational/event/doc tables so the sweep runs end to end
    write(v, "customer", [(i, f"c{i}", 0, float(i), "BUILDING")
                          for i in range(4)])
    write(v, "supplier", [(i, f"s{i}", 0, float(i)) for i in range(4)])
    write(v, "part", [(i, f"part {i}", "B#1", "SMALL BRASS", 1, 10.0)
                      for i in range(4)])
    write(v, "orders", [(i, i % 4, "O", 10.0, ts(i * 60), "1-URGENT")
                        for i in range(8)])
    write(v, "lineitem",
          [(i % 8, i % 4, i % 4, 1, 1.0, 10.0, 0.05, 0.02, "N", "O",
            ts(i * 30)) for i in range(16)])
    write(v, "events", [(i, ts(i), i % 3, "click", float(i), '{"k": 1}')
                        for i in range(30)])
    write(v, "documents", [(i, f"doc number {i} text", "en", "src0", 17)
                           for i in range(10)])
    # the point: zero vectors, tiny magnitudes, large magnitudes
    def vec(i):
        if i % 4 == 0:
            return [0.0] * DIM                      # exact zero vector
        if i % 4 == 1:
            return [1e-8 * ((i + j) % 3 - 1) for j in range(DIM)]  # tiny
        if i % 4 == 2:
            return [1e2 * ((i + j) % 5 - 2) for j in range(DIM)]   # large
        return [0.1 * ((i + j) % 7 - 3) for j in range(DIM)]       # normal
    write(v, "embeddings", [(i, vec(i), i % 3) for i in range(24)])


if __name__ == "__main__":
    gen_empty()
    gen_onerow()
    gen_ties()
    gen_unicode()
    gen_zerovec()
    print(f"wrote variants empty/onerow/ties/unicode/zerovec under {DST}")
