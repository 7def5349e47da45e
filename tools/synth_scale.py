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

Deliberately NOT synthesized: the TPC-H tables (FK structure cannot be
replicated by id shifts without breaking join semantics) and any
constant-density geography (geo coordinates are event_id-mod-derived
fixtures; see docs/SCALE.md).
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
