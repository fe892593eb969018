# partial sf100 for the round-13 lakehouse-audit decade pins:
# orders/events/part/customer only (the new gates' tables)
import os

import duckdb
con = duckdb.connect()
src, out, R = "/root/testdata/sf0.1", "/tmp/sf100", 1000
os.makedirs(out, exist_ok=True)
con.sql(f"""COPY (SELECT o_orderkey + r*10000000 AS o_orderkey, o_custkey + r*1000000 AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), (SELECT unnest(range({R})) AS r)) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
print("orders done")
con.sql(f"""COPY (SELECT event_id + r*10000000 AS event_id, CAST(ts AS TIMESTAMP_NS) AS ts,
  user_id + r*1000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), (SELECT unnest(range({R})) AS r)) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print("events done")
con.sql(f"""COPY (SELECT p_partkey + r*10000000 AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM read_parquet('{src}/part.parquet'), (SELECT unnest(range({R})) AS r)) TO '{out}/part.parquet' (FORMAT PARQUET)""")
print("part done")
con.sql(f"""COPY (SELECT c_custkey + r*1000000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet'), (SELECT unnest(range({R})) AS r)) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
print("customer done")
for t in ("orders","events","part","customer"):
    print(t, con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0])
