#!/usr/bin/env python3
"""Build /tmp/sfbig: a 10x-replica scale corpus from /root/testdata/sf0.1.

Local-only test tooling (driver-side python, never shipped): the scale
probe behind the README's "Nx time at 10x data" numbers. Design goals:

- primary keys shift per replica (doc_id, vec_id, o_orderkey,
  l_orderkey, event_id) so unions stay key-unique;
- foreign keys (custkey/partkey/suppkey/user_id) stay in range, so dim
  joins still resolve (per-key density grows 10x - the adversarial
  direction for group sizes);
- document text gets a POSITION-keyed per-replica token woven in every
  6 words: identical insertion for every doc in a replica (preserving
  within-replica near-dup structure) but disjoint across replicas
  (cross-replica Jaccard of a doc vs its twin drops below the 0.6
  near-dup threshold), so pair volume scales ~linearly like a real
  crawl decade, not quadratically like naive replication;
- embeddings get small deterministic per-replica noise (cluster
  structure survives; cross-replica vectors stop being bit-equal).

Usage: python3 tools/make_sfbig.py [out_dir] [replicas]
"""
import sys, os, shutil
import duckdb

SRC = '/root/testdata/sf0.1'
OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sfbig'
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# dims pass through unchanged
for t in ['region', 'nation', 'customer', 'supplier', 'part']:
    shutil.copyfile(f'{SRC}/{t}.parquet', f'{OUT}/{t}.parquet')

def replicate(table, sql):
    union = ' UNION ALL '.join(sql.format(r=r) for r in range(R))
    con.execute(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f'{table}: {n} rows')

# text: weave token w<r>_<i/6> in after every 6th word (same for every
# doc in replica r -> within-replica dup structure intact; disjoint
# grams across replicas -> cross-replica Jaccard < threshold)
replicate('documents', f"""
  SELECT doc_id + CAST({{r}} AS BIGINT) * 1000000 AS doc_id,
    array_to_string(flatten(list_transform(range(len(string_split(text,' '))),
      i -> CASE WHEN (i % 6) = 5
        THEN [string_split(text,' ')[i+1], 'w{{r}}x' || CAST(i//6 AS VARCHAR)]
        ELSE [string_split(text,' ')[i+1]] END)), ' ') AS text,
    lang, source, n_chars
  FROM '{SRC}/documents.parquet'""")

replicate('embeddings', f"""
  SELECT vec_id + CAST({{r}} AS BIGINT) * 1000000 AS vec_id,
    list_transform(range(len(embedding)),
      i -> CAST(embedding[i+1]
        + 0.01 * (((vec_id * 31 + i * 7 + {{r}} * 13) % 17) - 8) AS FLOAT)) AS embedding,
    label
  FROM '{SRC}/embeddings.parquet'""")

replicate('orders', f"""
  SELECT o_orderkey + CAST({{r}} AS BIGINT) * 10000000 AS o_orderkey, o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

replicate('lineitem', f"""
  SELECT l_orderkey + CAST({{r}} AS BIGINT) * 10000000 AS l_orderkey, l_partkey, l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

replicate('events', f"""
  SELECT event_id + CAST({{r}} AS BIGINT) * 10000000 AS event_id, ts, user_id,
    event_type, value, props
  FROM '{SRC}/events.parquet'""")
