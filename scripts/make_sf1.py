#!/usr/bin/env python3
"""Generate a 10x scale-up of sf0.1 documents/embeddings at /tmp/sf1 for
the fixed-floor perf evidence run (VERDICT r3 "what's wrong" #1/#2).

A naive 10x row copy would NOT be a fair scale-up: every doc would gain 9
exact duplicates, exploding candidate-pair counts quadratically inside
LSH buckets. Instead each replica r:
  - documents: rewrites every token to md5(token||'_r'||r)[:8], so the
    intra-replica Jaccard structure (and shingle counts) is preserved
    while cross-replica similarity collapses to ~0 — ten independent
    copies of the sf0.1 near-dup workload;
  - embeddings: applies a per-replica random permutation of the 64 dims,
    preserving all intra-replica norms/cosines while scrambling
    cross-replica cosines.
Replica 0 keeps the original data. Driver-side tooling only (duckdb is
not a library dependency).
"""
import os
import random
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

con = duckdb.connect()

con.sql(f"""
COPY (
  SELECT doc_id + r * 1000000 AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     t -> substr(md5(t || '_r' || CAST(r AS VARCHAR)), 1, 8)), ' ')
         END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

rnd = random.Random(42)
cases = []
for r in range(replicas):
    if r == 0:
        cases.append("WHEN r = 0 THEN embedding")
    else:
        perm = list(range(1, 65))  # duckdb list indexing is 1-based
        rnd.shuffle(perm)
        cases.append(f"WHEN r = {r} THEN list_select(embedding, {perm})")
case_sql = "CASE " + " ".join(cases) + " END"

con.sql(f"""
COPY (
  SELECT vec_id + r * 1000000 AS vec_id,
         {case_sql} AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

# events: each replica keeps the per-user inter-arrival structure (the
# thing sessionization depends on) but remaps users into a disjoint id
# space — ten independent copies of the sf0.1 session workload. Nanos
# stay micro-truncated like the source (epoch_ns parity with DuckDB).
con.sql(f"""
COPY (
  SELECT event_id + r * 10000000 AS event_id,
         CAST(ts AS TIMESTAMP_NS) AS ts,
         user_id + r * 1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{src}/events.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

# orders/lineitem: disjoint key spaces per replica (keys shift by
# r*1e7), preserving per-order line structure — feeds the HLL distinct
# sketch (distinct orderkeys scale linearly) and the fuzzy join (the
# %3000 fingerprint classes grow with scale, a deliberately harder
# linkage workload — quadratic pair growth is the workload's nature).
con.sql(f"""
COPY (
  SELECT o_orderkey + r * 10000000 AS o_orderkey,
         o_custkey + r * 1000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT l_orderkey + r * 10000000 AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "embeddings", "events", "orders", "lineitem"):
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{out}/{t}.parquet: {n} rows")

# part/customer (round 13): disjoint key spaces per replica. part keeps
# its (price, size) multiset — skyline duplicates are the workload's
# nature; customer custkeys shift by r*1e6 to MATCH the orders shift,
# so per-replica FK structure (x_dq_constraints) replicates exactly.
con.sql(f"""
COPY (
  SELECT p_partkey + r * 10000000 AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM read_parquet('{src}/part.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT c_custkey + r * 1000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet'),
       (SELECT unnest(range({replicas})) AS r)
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")
for t in ("part", "customer"):
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{out}/{t}.parquet: {n} rows")
