#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (driver-side python:
duckdb+pyarrow are available on this machine for the *driver*; this script
is tooling for the build loop, not part of the library).

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Replays each oracle_sql.json entry in DuckDB over views named after the
parquet tables, reads the Spark-written parquet for the same query, sorts
columns by name, and compares shape + values exactly (doubles must be
bit-identical — that is the design contract of graft.Det).

Oracle results are CACHED under target/oracle_cache keyed by
(sql text, sf dir, fixture file sizes+mtimes): an oracle's output is a
pure function of its SQL and the input parquet, so replaying an
unchanged oracle (dedup_near_keep's recursive CTE alone dominates the
sf0.1 check at ~25 min) is pure waste in the local loop. Any edit to
the oracle string or the fixture invalidates the key by construction.
GRAFT_ORACLE_CACHE=0 disables (the driver's own gate never caches).
"""
import sys, json, math, glob, os, gzip, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

CACHE_DIR = "/root/repo/target/oracle_cache"

def cache_key(sql, sf):
    h = hashlib.sha256()
    h.update(sql.encode())
    h.update(sf.encode())
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        try:
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
        except FileNotFoundError:
            h.update(f"{t}:absent".encode())
    return h.hexdigest()

def cache_get(key):
    try:
        with gzip.open(f"{CACHE_DIR}/{key}.json.gz", "rt") as f:
            return json.load(f)
    except Exception:
        return None

def cache_put(key, payload):
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{CACHE_DIR}/{key}.json.gz.tmp{os.getpid()}"
        with gzip.open(tmp, "wt") as f:
            json.dump(payload, f)
        os.replace(tmp, f"{CACHE_DIR}/{key}.json.gz")
    except Exception:
        pass

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    use_cache = os.environ.get("GRAFT_ORACLE_CACHE", "1") != "0"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        key = cache_key(sql, sf) if use_cache else None
        cached = cache_get(key) if use_cache else None
        if cached is not None:
            expcols = cached["cols"]
            decs = cached["decs"]
            e_rows = [tuple(r) for r in cached["rows"]]
        else:
            try:
                # single execution: the arrow table provides both the
                # schema (for the decimal check below) and the row values
                duck_arrow = con.execute(sql).arrow()
                expcols = duck_arrow.schema.names
                cols = [duck_arrow.column(i).to_pylist()
                        for i in range(duck_arrow.num_columns)]
                exp = list(zip(*cols)) if cols else []
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}")
                n_fail += 1
                continue
            decs = [f"{n}:{t}" for n, t in zip(duck_arrow.schema.names,
                                               duck_arrow.schema.types)
                    if "decimal" in str(t)]
            eperm = sorted(range(len(expcols)), key=lambda i: expcols[i])
            e_rows = [tuple(norm(r[i]) for i in eperm) for r in exp]
            if use_cache:
                cache_put(key, {"name": name, "cols": list(expcols),
                                "decs": decs,
                                "rows": [list(r) for r in e_rows]})
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        gotcols = [d[0] for d in con.description]
        # driver sorts columns by name before hashing
        gperm = sorted(range(len(gotcols)), key=lambda i: gotcols[i])
        if sorted(expcols) != sorted(gotcols):
            print(f"FAIL {name}: schema {sorted(gotcols)} != {sorted(expcols)}")
            n_fail += 1
            continue
        # Driver-hash hazard: DuckDB SUM(integer) returns HUGEINT, which
        # surfaces as decimal128(38,0) in arrow — the driver stringifies
        # that differently from Spark's int64 even when values agree
        # (round-1 lesson: 8 queries failed ONLY in the driver for this).
        # Any decimal in the oracle's arrow schema is therefore an error:
        # CAST the oracle column (usually to BIGINT).
        if decs:
            print(f"FAIL {name}: oracle arrow emits decimal cols {decs} "
                  f"(HUGEINT sums? CAST ... AS BIGINT)")
            n_fail += 1
            continue
        g_rows = [tuple(norm(r[i]) for i in gperm) for r in got]
        if e_rows == g_rows:
            print(f"PASS {name} ({len(e_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(e_rows) != len(g_rows):
                print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}")
            else:
                for i, (a, b) in enumerate(zip(g_rows, e_rows)):
                    if a != b:
                        print(f"FAIL {name}: first diff row {i}:\n  spark={a}\n  duck ={b}")
                        break
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
