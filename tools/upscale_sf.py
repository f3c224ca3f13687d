#!/usr/bin/env python3
"""Deterministic 10x (or Nx) upscale of a driver testdata sf dir, for
bench tiers above the driver's largest committed scale factor. Each
table is the union of N key-shifted copies: every id/foreign-key column
shifts by copy * BASE (one base per key width), so referential joins
stay intact within a copy and copies never collide. Non-key payloads
(names, text, vectors, timestamps) are byte-identical across copies —
exact duplicates are the realistic crawl-corpus shape, and both engines
read the same files, so every differential stays valid.

pyarrow, not duckdb: the events table carries nanosecond timestamps that
the Spark side reads under nanosAsLong — a duckdb round-trip would
silently rewrite them to microseconds and change the engine's schema.

Usage: upscale_sf.py <srcSfDir> <dstDir> [copies=10]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BIG = 10_000_000_000  # BIGINT key shift per copy
SMALL = 1_000_000     # INTEGER key shift per copy

SHIFTS = {
    "region": {"r_regionkey": SMALL},
    "nation": {"n_nationkey": SMALL, "n_regionkey": SMALL},
    "customer": {"c_custkey": BIG, "c_nationkey": SMALL},
    "supplier": {"s_suppkey": BIG, "s_nationkey": SMALL},
    "part": {"p_partkey": BIG},
    "orders": {"o_orderkey": BIG, "o_custkey": BIG},
    "lineitem": {"l_orderkey": BIG, "l_partkey": BIG, "l_suppkey": BIG},
    "events": {"event_id": BIG, "user_id": BIG},
    "documents": {"doc_id": BIG},
    "embeddings": {"vec_id": BIG},
}


def upscale(src, dst, copies):
    import os
    os.makedirs(dst, exist_ok=True)
    for table, shifts in SHIFTS.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            print(f"skip {table} (absent)")
            continue
        t = pq.read_table(path)
        parts = []
        for k in range(copies):
            cols = []
            for name in t.column_names:
                col = t[name]
                if name in shifts and k > 0:
                    col = pc.add(col, pa.scalar(k * shifts[name],
                                                type=col.type))
                cols.append(col)
            parts.append(pa.table(dict(zip(t.column_names, cols)),
                                  schema=t.schema))
        out = pa.concat_tables(parts)
        # ~64 row groups per table: a single-row-group file pins every
        # Spark scan (and DuckDB's row-group parallelism) to ONE thread —
        # nothing like the many-file reality this tier models. Both
        # engines read the same layout, so differentials stay valid.
        rgs = max(1024, -(-out.num_rows // 64))
        pq.write_table(out, f"{dst}/{table}.parquet", row_group_size=rgs)
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows "
              f"(row_group_size={rgs})")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upscale(src, dst, n)
