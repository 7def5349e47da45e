#!/usr/bin/env python3
"""Synthesize a 10x corpus from sf0.1 for the scaling-curve bench.

Usage: python3 tools/synth_scale.py [K] [src] [dst]

Replicates documents / embeddings / events K times with id shifts:
- documents: doc_id shifted per copy; a per-copy suffix token is
  appended to text so near-duplicate STRUCTURE is preserved instead of
  planting K exact copies of every doc (which would grow every LSH/band
  bucket K-fold and make pair volume quadratic by construction, not by
  plan shape). n_chars tracks the new text length.
- embeddings: vec_id shifted per copy (IVF/LSH bucket occupancy grows
  linearly, the honest serving-layout scaling).
- events: event_id and user_id shifted per copy — per-user event
  density stays constant, user count grows 10x.

The TPC-H FACT tier (orders, lineitem) scales K times too — verdict
r13 task 1: a copied-unscaled relational tier left the 22 TPC-H
queries and the join family "10x-proven" at 1x. Congruence-class
synthesis keeps every FK in-domain:
- orders: o_orderkey shifted per copy; o_custkey ROTATED per copy
  (bijective +k*6151 mod |customer|) so copies aren't per-customer
  duplicates and aggregates aren't a degenerate exact-K multiple.
- lineitem: l_orderkey shifted by the SAME offset (orders<->lineitem
  join preserved); l_partkey / l_suppkey unchanged — the realistic
  shape where the same catalog serves K times the order volume, and
  the synthesized partsupp (part x supplier congruence, independent
  of lineitem) stays consistent.
Dimensions (customer, part, supplier, nation, region) stay unscaled:
dims grow slower than facts, and every fact FK must stay in-domain.

Deliberately NOT synthesized: constant-density geography (geo
coordinates are event_id-mod-derived fixtures; see docs/SCALE.md).
"""
import duckdb, os, sys

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_synth"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def synth(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")


docs = f"read_parquet('{src}/documents.parquet')"
synth("documents", f"""
  WITH m AS (SELECT max(doc_id) + 1 AS off FROM {docs})
  SELECT d.doc_id + k.k * m.off AS doc_id,
         CASE WHEN k.k = 0 THEN d.text ELSE d.text || ' c' || k.k END AS text,
         d.lang, d.source,
         CASE WHEN k.k = 0 THEN d.n_chars
              ELSE d.n_chars + strlen(' c' || k.k) END AS n_chars
  FROM {docs} d, (SELECT unnest(range({K})) AS k) k, m
  ORDER BY 1""")

emb = f"read_parquet('{src}/embeddings.parquet')"
synth("embeddings", f"""
  WITH m AS (SELECT max(vec_id) + 1 AS off FROM {emb})
  SELECT e.vec_id + k.k * m.off AS vec_id, e.embedding, e.label
  FROM {emb} e, (SELECT unnest(range({K})) AS k) k, m
  ORDER BY 1""")

ev = f"read_parquet('{src}/events.parquet')"
synth("events", f"""
  WITH m AS (SELECT max(event_id) + 1 AS eoff, max(user_id) + 1 AS uoff FROM {ev})
  SELECT e.event_id + k.k * m.eoff AS event_id, e.ts,
         e.user_id + k.k * m.uoff AS user_id,
         e.event_type, e.value, e.props
  FROM {ev} e, (SELECT unnest(range({K})) AS k) k, m
  ORDER BY 1""")

ords = f"read_parquet('{src}/orders.parquet')"
synth("orders", f"""
  WITH m AS (SELECT max(o_orderkey) + 1 AS ooff FROM {ords}),
       c AS (SELECT count(*) AS nc FROM read_parquet('{src}/customer.parquet'))
  SELECT o.o_orderkey + k.k * m.ooff AS o_orderkey,
         (o.o_custkey + k.k * 6151) % c.nc AS o_custkey,
         o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
  FROM {ords} o, (SELECT unnest(range({K})) AS k) k, m, c
  ORDER BY 1""")

li = f"read_parquet('{src}/lineitem.parquet')"
synth("lineitem", f"""
  WITH m AS (SELECT max(o_orderkey) + 1 AS ooff FROM {ords})
  SELECT l.l_orderkey + k.k * m.ooff AS l_orderkey,
         l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
         l.l_extendedprice, l.l_discount, l.l_tax,
         l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM {li} l, (SELECT unnest(range({K})) AS k) k, m
  ORDER BY 1""")

# dimensions ride along unscaled so the corpus is complete in one run
import shutil
for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"{t}: copied unscaled (dimension)")
