#!/usr/bin/env python3
"""Synthesize an sf1-shaped dataset from the driver's sf0.1 parquet (dev
measurement harness only — correctness always runs on the driver's own
testdata). Ten independent copies of sf0.1, spliced so the step behaves
like a genuinely 10x-larger corpus rather than pathological duplication:

- fact keys (orderkey/custkey/suppkey/partkey/event_id/user_id/doc_id/
  vec_id) are offset per copy, preserving FK structure — 10 disjoint
  key universes, same per-key row counts;
- dimension tables (region, nation) stay single-copy: dims don't grow
  with data scale, and replicating them would break key uniqueness;
- documents.text gets a per-copy token suffix (copy 0 untouched), so
  shingles never match across copies: near-dup/dedup pair volume grows
  linearly (10 independent corpora), exactly the behavior of a larger
  crawl — naive text duplication would instead create 10x10 exact-dup
  cliques and quadratic candidate growth by construction;
- each fact table is a DIRECTORY of one parquet file per copy. This is
  the part that makes scan-side scaling honest: the driver's dev files
  are single-file single-row-group, which parquet reads as ONE task, so
  a bigger single file would measure single-thread scan pathology, not
  query scaling. A real 10x corpus arrives as more files; so does this
  one. (Spark reads the directory; file count = scan parallelism.)

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
# copy count: 10 = sf1; 30 = sf3 (the graph-family growth decade,
# round-10 verdict ask #6). Same construction either way.
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 100_000_000  # > every key in sf0.1

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


def gen_single(table, sql):
    """Dims: one file, like the source."""
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows (single file)")


def gen_percopy(table, sql_of_copy):
    """Facts: <table>.parquet/ directory, one file per copy."""
    d = f"{DST}/{table}.parquet"
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    for c in range(COPIES):
        con.execute(
            f"COPY ({sql_of_copy(c)}) TO '{d}/part-{c:02d}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"{table}: {n} rows ({COPIES} files)")


for t in ("region", "nation"):
    gen_single(t, f"SELECT * FROM {src(t)}")

gen_percopy("customer", lambda c: f"""
  SELECT c_custkey + {c*OFF} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM {src('customer')}""")

gen_percopy("supplier", lambda c: f"""
  SELECT s_suppkey + {c*OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}""")

gen_percopy("part", lambda c: f"""
  SELECT p_partkey + {c*OFF} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM {src('part')}""")

gen_percopy("orders", lambda c: f"""
  SELECT o_orderkey + {c*OFF} AS o_orderkey, o_custkey + {c*OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

gen_percopy("lineitem", lambda c: f"""
  SELECT l_orderkey + {c*OFF} AS l_orderkey, l_partkey + {c*OFF} AS l_partkey,
         l_suppkey + {c*OFF} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate FROM {src('lineitem')}""")

gen_percopy("documents", lambda c: f"""
  SELECT doc_id + {c*OFF} AS doc_id,
         {"text" if c == 0 else
          f"array_to_string(list_transform(string_split(text, ' '), t -> t || '_{c}'), ' ')"} AS text,
         lang, source,
         {"n_chars" if c == 0 else
          f"length(array_to_string(list_transform(string_split(text, ' '), t -> t || '_{c}'), ' '))"} AS n_chars
  FROM {src('documents')}""")

gen_percopy("embeddings", lambda c: f"""
  SELECT vec_id + {c*OFF} AS vec_id, embedding, label FROM {src('embeddings')}""")

# events goes through pyarrow, not DuckDB: the engine reads ts as parquet
# TIMESTAMP(NANOS) (Tables.loadEvents replays the driver file's type), and
# DuckDB's COPY downcasts it to micros. pyarrow version='2.6' keeps ns.
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{SRC}/events.parquet")
evd = f"{DST}/events.parquet"
os.makedirs(evd, exist_ok=True)
for f in os.listdir(evd):
    os.remove(os.path.join(evd, f))
for c in range(COPIES):
    t = (ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                       pc.add(ev["event_id"], c * OFF))
           .set_column(ev.schema.get_field_index("user_id"), "user_id",
                       pc.add(ev["user_id"], c * OFF)))
    pq.write_table(t, f"{evd}/part-{c:02d}.parquet", version="2.6")
print(f"events: {ev.num_rows * COPIES} rows ({COPIES} files, ns ts preserved)")
