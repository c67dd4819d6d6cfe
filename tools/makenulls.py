#!/usr/bin/env python3
"""Null-stress twin of a fixture dir (build-loop tooling, driver-side
python like check.py). Copies every table, nulling a deterministic ~5%
of selected VALUE columns (never join/order keys, so positional
row-compare in check.py stays meaningful). Both engines then process
the SAME nulled parquet, so the oracle gate verifies that Spark's and
DuckDB's null semantics agree expression-by-expression — the class of
bug an all-non-null fixture can never catch.

Usage: python3 tools/makenulls.py [srcDir] [dstDir]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

# (table, key column driving the deterministic gate, columns to null)
PLAN = {
    # offset 3 keeps doc_id 0 non-null: multimodal_embed's query-vector
    # anchor (doc_id = 0 after the media source's text IS NOT NULL
    # filter) — nulling it would make that query empty on both engines
    # and pass the gate vacuously. Same reasoning as embeddings below.
    "documents": ("doc_id", ["text", "lang"], 3),
    "events": ("event_id", ["value", "props"]),
    "orders": ("o_orderkey", ["o_comment"]),
    # gate offset 7 keeps vec_id 0 non-null: the similarity queries'
    # query-vector anchor; a null QUERY vector is a caller error, while
    # null corpus embeddings are the stress this twin exists for
    "embeddings": ("vec_id", ["embedding"], 7),
}
ALL = ["region", "nation", "customer", "supplier", "part",
       "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/nullfix"
    import os
    os.makedirs(dst, exist_ok=True)
    for t in ALL:
        tab = pq.read_table(f"{src}/{t}.parquet")
        if t in PLAN:
            key, cols, off = (PLAN[t] + (0,))[:3]
            kv = tab.column(key).to_pylist()
            mask = [v % 20 == off for v in kv]  # deterministic ~5%
            arrays = []
            for name in tab.schema.names:
                col = tab.column(name)
                if name in cols:
                    vals = col.to_pylist()
                    vals = [None if m else v for v, m in zip(vals, mask)]
                    arrays.append(pa.array(vals, type=tab.schema.field(name).type))
                else:
                    arrays.append(col)
            tab = pa.table(arrays, schema=tab.schema)
        pq.write_table(tab, f"{dst}/{t}.parquet")
        print(f"wrote {dst}/{t}.parquet rows={tab.num_rows}")


if __name__ == "__main__":
    main()
