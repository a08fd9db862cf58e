#!/usr/bin/env python3
"""One-off scale spot-check data builder (r18, verdict item 9).

Replicates the sf0.1 tables K times with disjoint key offsets into an
output dir, preserving referential integrity (orderkey offsets applied
to both orders and lineitem, custkey to customer+orders, part/supp
likewise). Replica 0 keeps the original ids, so every pinned literal
(query ids < 5, BFS anchors, IVF seed ids) still resolves; replicas
1..K-1 add corpus mass. Used ONLY for a one-off 8-vs-32-core scale
measurement in /tmp — never by the bench or verify paths, and nothing
is cached against /root/testdata.

Usage: python3 tools/scale_testdata.py <srcDir> <outDir> <K>
"""
import sys
import duckdb

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute(f"SET threads TO 16")

OFF = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "docid": 100_000,
    "vecid": 100_000,
    "eventid": 1_000_000,
    "userid": 100_000,
}

TABLES = {
    "orders": ("o_orderkey + i*{orderkey} AS o_orderkey, "
               "o_custkey + i*{custkey} AS o_custkey, o_orderstatus, "
               "o_totalprice, o_orderdate, o_orderpriority"),
    "lineitem": ("l_orderkey + i*{orderkey} AS l_orderkey, "
                 "l_partkey + i*{partkey} AS l_partkey, "
                 "l_suppkey + i*{suppkey} AS l_suppkey, l_linenumber, "
                 "l_quantity, l_extendedprice, l_discount, l_tax, "
                 "l_returnflag, l_linestatus, l_shipdate"),
    "customer": ("c_custkey + i*{custkey} AS c_custkey, c_name, "
                 "c_nationkey, c_acctbal, c_mktsegment"),
    "part": ("p_partkey + i*{partkey} AS p_partkey, p_name, p_brand, "
             "p_type, p_size, p_retailprice"),
    "supplier": ("s_suppkey + i*{suppkey} AS s_suppkey, s_name, "
                 "s_nationkey, s_acctbal"),
    "documents": ("doc_id + i*{docid} AS doc_id, text, lang, source, "
                  "n_chars"),
    "embeddings": "vec_id + i*{vecid} AS vec_id, embedding, label",
    "events": ("event_id + i*{eventid} AS event_id, ts, "
               "user_id + i*{userid} AS user_id, event_type, value, "
               "props"),
}

import os
os.makedirs(out, exist_ok=True)
for t in ["nation", "region"]:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")
for t, proj in TABLES.items():
    p = proj.format(**OFF)
    con.execute(
        f"COPY (SELECT {p} FROM '{src}/{t}.parquet', "
        f"(SELECT unnest(range({k})) AS i)) TO '{out}/{t}.parquet' "
        f"(FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
