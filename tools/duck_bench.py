#!/usr/bin/env python3
"""Time every oracle query in DuckDB at a given sf (the bench comparison
baseline). Usage: duck_bench.py <sfDir> <verifyOutDir-with-oracle_sql.json>"""
import json, sys, time, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0; times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            dt = time.time() - t0
        except Exception as ex:
            dt = float("nan"); print(f"{name}: ERROR {str(ex)[:60]}")
        times[name] = dt; total += dt if dt == dt else 0
    for k, v in sorted(times.items(), key=lambda x: -x[1])[:8]:
        print(f"{v:8.2f}  {k}")
    print(f"TOTAL {total:.1f}s over {len(times)} queries")
    # per-query map for graft.Bench to splice into bench_out.json as the
    # "oracle" field — per-query >2x adjudication against the SAME-box
    # DuckDB run instead of a stale total. Written to the cwd, like
    # bench_out.json itself. The sf stamp (parsed from the dir name the
    # same way Bench parses its own) lets Bench refuse a stale file from
    # a run at a different scale factor.
    import re
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)/?$", sf_dir)
    sf = m.group(1) if m else "-1"
    qmap = "{" + ",".join(
        f'"{k}":{v:.2f}' for k, v in sorted(times.items()) if v == v) + "}"
    with open("oracle_bench.json", "w") as f:
        f.write('{"sf":%s,"ts":%d,"queries":%s}\n'
                % (sf, int(time.time()), qmap))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
