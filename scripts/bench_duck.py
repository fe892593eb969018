#!/usr/bin/env python3
"""Cold-DuckDB timing of oracle SQL — the judge's perf yardstick.

Usage:
    python3 scripts/bench_duck.py <sf_dir> <out_dir_with_oracle_sql.json> q1 q2 ...

Each query runs in a FRESH subprocess (cold catalog, cold allocator) and
reports wall-clock seconds for execute+fetch, mirroring how the judge
compares "cold DuckDB on identical oracle SQL".
"""
import json
import os
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    n = len(con.sql(sql).fetchall())
    return time.time() - t0, n


if __name__ == "__main__":
    if os.environ.get("BENCH_DUCK_CHILD"):
        sf_dir = sys.argv[1]
        sql = sys.stdin.read()
        secs, n = run_one(sf_dir, sql)
        print(json.dumps({"sec": secs, "rows": n}))
        sys.exit(0)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in names:
        env = dict(os.environ, BENCH_DUCK_CHILD="1")
        proc = subprocess.run(
            [sys.executable, __file__, sf_dir],
            input=oracle[name], capture_output=True, text=True, env=env)
        if proc.returncode != 0:
            results[name] = {"error": proc.stderr.strip()[-500:]}
        else:
            results[name] = json.loads(proc.stdout)
    print(json.dumps({"sf": sf_dir, "cold_duckdb": results}))
