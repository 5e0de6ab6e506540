#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet
tables, loads the Spark-written parquet for the same key, sorts both
by all columns (column names sorted), and compares values exactly
(doubles to 1e-9 rel tolerance as a diagnostic; exact-equal is the
goal). Prints one line per query: OK / MISMATCH / ERROR.

Oracle results are memoized under /tmp/graft_oracle_cache keyed by
(sql text, dataset file stats): the unrolled-CTE oracles (pagerank
family) take ~12 min each at sf~1, and a re-sweep after an
engine-only change should not re-pay them. Staged-artifact oracles
embed per-run /tmp stage paths in their SQL, so their key never
matches a stale stage. GRAFT_ORACLE_CACHE=0 disables.
"""
import sys, json, glob, math, os, hashlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

CACHE_DIR = "/tmp/graft_oracle_cache"


def oracle_df(con, sql, data_digest):
    if os.environ.get("GRAFT_ORACLE_CACHE", "1") == "0":
        return con.execute(sql).df()
    key = hashlib.sha256((sql + "\x00" + data_digest).encode()).hexdigest()[:24]
    path = f"{CACHE_DIR}/{key}.parquet"
    if not os.path.exists(path):
        # DuckDB writes its own result types — a pandas round-trip
        # would degrade an all-NULL VARCHAR column to float NaN
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        con.execute(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, path)
    return con.execute(f"SELECT * FROM read_parquet('{path}')").df()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    digest_parts = []
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        st = os.stat(f"{sf_dir}/{t}.parquet")
        digest_parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    data_digest = ";".join(digest_parts)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        spark_failed = json.load(open(f"{out_dir}/_failed.json"))
    except FileNotFoundError:
        spark_failed = {}
    n_ok = n_bad = 0
    for name in sorted(oracle):
        # a query that THREW on the Spark side is a failure even when
        # the oracle result happens to be empty (e.g. pagerank over an
        # edge-free graph: the oracle returns 0 rows, the engine must
        # too — not crash)
        if name in spark_failed:
            print(f"SPARK-FAILED {name}: {spark_failed[name][:200]}")
            n_bad += 1
            continue
        try:
            want = oracle_df(con, oracle[name], data_digest)
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if files:
                got = con.execute(
                    f"SELECT * FROM read_parquet({files!r})").df()
            else:
                # a 0-partition Spark result writes no part files at all
                # (AQE empty-relation propagation) — an empty frame with
                # the oracle's columns compares correctly below. That
                # fabrication means Spark's column names/types were NOT
                # verified for this query: say so, loudly, so an
                # all-green sweep can't hide a schema-only divergence
                # behind an empty result.
                print(f"WARN {name}: no Spark part files — row count 0 "
                      f"verified, Spark-side schema NOT verified")
                got = want.iloc[0:0].copy()
            # driver semantics: sort columns by name, then sort rows
            want = want[sorted(want.columns)]
            got = got[sorted(got.columns)]
            if list(want.columns) != list(got.columns):
                print(f"MISMATCH {name}: cols want={list(want.columns)} got={list(got.columns)}")
                n_bad += 1; continue
            want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
            got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            if len(want) != len(got):
                print(f"MISMATCH {name}: rows want={len(want)} got={len(got)}")
                n_bad += 1; continue
            bad = []
            for c in want.columns:
                wv, gv = want[c].tolist(), got[c].tolist()
                for i, (w, g) in enumerate(zip(wv, gv)):
                    if w is None and g is None: continue
                    if isinstance(w, float) and isinstance(g, float):
                        if w != g and not (math.isnan(w) and math.isnan(g)):
                            rel = abs(w-g)/max(1e-30, abs(w))
                            bad.append((c, i, w, g, rel))
                    elif str(w) != str(g):
                        bad.append((c, i, w, g, None))
            if bad:
                exact = all(b[4] is not None and b[4] < 1e-9 for b in bad)
                tag = "FLOAT-DRIFT" if exact else "MISMATCH"
                print(f"{tag} {name}: {len(bad)} diffs, first: {bad[0]}")
                n_bad += 1
            else:
                print(f"OK {name} ({len(want)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
    for name in sorted(set(spark_failed) - set(oracle)):
        print(f"SPARK-FAILED {name} (rows-only): {spark_failed[name][:200]}")
        n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
