#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`:
    python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

For each query dir under out/, loads the Spark parquet result, runs the
oracle SQL from oracle_sql.json in DuckDB over the same testdata tables,
sorts columns by name and rows by value, and compares exactly.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            rel = con.sql(sql)
            # HUGEINT/UHUGEINT output columns round-trip as float64 in the
            # driver's hasher => hash mismatch even when values are equal.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT columns {huge} "
                      f"(CAST to BIGINT)"); n_fail += 1; continue
            exp = rel.fetchall()
            ecols = rel.columns
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, g = canon(got, gcols)
        ec, e = canon(exp, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            sg, se = set(g), set(e)
            for r in list(sg - se)[:3]:
                print(f"   spark-only: {r}")
            for r in list(se - sg)[:3]:
                print(f"   duck-only:  {r}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
