#!/usr/bin/env python3
"""Deterministic dirty-corpus builder for the cross-engine parity gate.

Usage: python3 tools/dirty_corpus.py [src_sf_dir] [dst_root]
       (defaults: /root/testdata/sf0.001  /tmp/dirty_gates)

Builds FIVE corpora under <dst_root>/{events,embeddings,star,docs,all}
— one per tier, each a full copy of the clean sf dir with that tier's
table(s) replaced by clean-rows + appended pathological rows, plus
`all` with EVERY dirty table at once (cross-tier interactions). The
parity claim
(docs/NOTES.md "cross-engine parity ON dirty data") is then one
command per corpus:

    python3 tools/check.py <dst_root>/events /tmp/verify_dirty_events

Expected: `243 pass, 0 fail` on every corpus. Pathological surface per
tier:
  events:     null ts / null type / NaN / ±Inf / negative value /
              null + non-JSON + type-mismatched props
  embeddings: null / empty / off-dimension / zero-norm / NaN / Inf /
              null-component vectors, null label
  star:       null & duplicate & negative keys, orphan FKs, NaN/Inf
              measures, out-of-domain discount, null dates/statuses
  docs:       null/empty/whitespace text, single char, zero diversity,
              multi-byte unicode, 10k single token, control chars,
              space runs, null lang/source
"""
import duckdb, os, shutil, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dirty_gates"

ALL = ["region", "nation", "customer", "supplier", "part", "orders",
       "lineitem", "events", "documents", "embeddings"]


def copy_clean(dst, skip):
    os.makedirs(dst, exist_ok=True)
    for t in ALL:
        if t in skip:
            continue
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(dst, f"{t}.parquet"))


con = duckdb.connect()

# ---- events tier -----------------------------------------------------
d = os.path.join(DST, "events")
copy_clean(d, {"events"})
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/events.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (900001, NULL::TIMESTAMP, 3, 'click', 10.0, '{{"k": 7}}'),
    (900002, TIMESTAMP '2024-01-05 12:00:00', 4, NULL, 20.0, '{{"k": 8}}'),
    (900003, TIMESTAMP '2024-01-05 12:00:00', 5, 'view', 'NaN'::DOUBLE, '{{"k": 9}}'),
    (900004, TIMESTAMP '2024-01-05 12:00:00', 6, 'purchase', 'Infinity'::DOUBLE, '{{"k": 10}}'),
    (900005, TIMESTAMP '2024-01-05 12:00:00', 7, 'click', '-Infinity'::DOUBLE, '{{"k": 11}}'),
    (900006, TIMESTAMP '2024-01-05 12:00:00', 8, 'view', -42.5, '{{"k": 12}}'),
    (900009, TIMESTAMP '2024-01-05 12:00:00', 10, 'click', 32.0, NULL),
    (900010, TIMESTAMP '2024-01-05 12:00:00', 11, 'view', 33.0, 'not json at all'),
    (900011, TIMESTAMP '2024-01-05 12:00:00', 12, 'click', 34.0, '{{"k": "xyz"}}'),
    (900012, TIMESTAMP '2024-01-05 12:00:00', 13, 'purchase', NULL::DOUBLE, '{{"k": 15}}')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{d}/events.parquet' (FORMAT PARQUET)""")

# ---- embeddings tier -------------------------------------------------
d = os.path.join(DST, "embeddings")
copy_clean(d, {"embeddings"})
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (900001, NULL::FLOAT[], 1),
    (900002, []::FLOAT[], 2),
    (900003, list_transform(range(16), x -> x::FLOAT), 3),
    (900004, list_transform(range(128), x -> x::FLOAT), 4),
    (900005, list_transform(range(64), x -> 0.0::FLOAT), 5),
    (900006, list_transform(range(64), x -> CASE WHEN x = 7 THEN 'NaN'::FLOAT ELSE 0.1::FLOAT END), 6),
    (900007, list_transform(range(64), x -> CASE WHEN x = 3 THEN 'Infinity'::FLOAT ELSE 0.1::FLOAT END), 7),
    (900009, list_transform(range(64), x -> CASE WHEN x = 11 THEN NULL::FLOAT ELSE 0.2::FLOAT END), 9),
    (900010, list_transform(range(64), x -> (0.05 * x)::FLOAT), NULL)
  ) t(vec_id, embedding, label)
) TO '{d}/embeddings.parquet' (FORMAT PARQUET)""")

# ---- star-schema tier ------------------------------------------------
d = os.path.join(DST, "star")
copy_clean(d, {"customer", "orders", "lineitem"})
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/customer.parquet')
  UNION ALL SELECT * FROM (VALUES
    (900001, NULL, 1, 100.0, 'BUILDING'),
    (900002, 'Customer#dirty2', 2, 'NaN'::DOUBLE, 'AUTOMOBILE'),
    (900003, 'Customer#dirty3', 3, 'Infinity'::DOUBLE, 'MACHINERY'),
    (900004, 'Customer#dirty4', 99, NULL::DOUBLE, NULL),
    (-5, 'Customer#dirty5', 4, 0.0, 'HOUSEHOLD')
  ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
) TO '{d}/customer.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/orders.parquet')
  UNION ALL SELECT * FROM (VALUES
    (910001, NULL::BIGINT, 'O', 100.0, TIMESTAMP '1996-06-01', '1-URGENT'),
    (910002, 900001, NULL, 200.0, TIMESTAMP '1996-06-01', '2-HIGH'),
    (910003, 900002, 'F', 'NaN'::DOUBLE, TIMESTAMP '1996-06-01', '3-MEDIUM'),
    (910004, 900003, 'O', 300.0, NULL::TIMESTAMP, '4-NOT SPECIFIED'),
    (910005, 77777777, 'X', -50.0, TIMESTAMP '1996-06-01', NULL),
    (1, 900001, 'O', 400.0, TIMESTAMP '1996-06-01', '5-LOW')
  ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
) TO '{d}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
  UNION ALL SELECT * FROM (VALUES
    (920001, 1, 1, 1, 'NaN'::DOUBLE, 100.0, 0.05, 0.02, 'N', 'O', TIMESTAMP '1996-06-01'),
    (920002, 2, 2, 1, 10.0, 'Infinity'::DOUBLE, 0.05, 0.02, 'N', 'O', TIMESTAMP '1996-06-01'),
    (920003, 3, 3, 1, -4.0, 100.0, 1.5, 0.02, 'R', 'F', TIMESTAMP '1996-06-01'),
    (920004, 4, 4, 1, 10.0, 100.0, 0.05, 0.02, NULL, NULL, NULL::TIMESTAMP),
    (910005, 99999999, 5, 2, 10.0, 100.0, 0.05, 0.02, 'A', 'F', TIMESTAMP '1996-06-01')
  ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
      l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")

# ---- documents tier --------------------------------------------------
d = os.path.join(DST, "docs")
copy_clean(d, {"documents"})
con.execute(f"""COPY (
  SELECT * FROM read_parquet('{SRC}/documents.parquet')
  UNION ALL BY NAME
  SELECT * FROM (VALUES
    (9001, NULL, 'en', 'crawl', 0),
    (9002, '', 'en', 'crawl', 0),
    (9003, '   ', 'en', 'crawl', 3),
    (9004, 'a', 'en', 'crawl', 1),
    (9005, 'the the the the the', 'en', 'crawl', 19),
    (9006, 'naïve café über straße 東京 таблица', 'xx', 'crawl', 34),
    (9007, repeat('x', 10000), 'en', 'crawl', 10000),
    (9008, 'tab' || chr(9) || 'and' || chr(10) || 'newline' || chr(13) || 'chars', 'en', 'crawl', 21),
    (9009, 'a  b   c', 'en', 'crawl', 8),
    (9010, 'select from where join the a', NULL, NULL, 28),
    (9011, 'the quick brown fox jumps over the lazy dog again', 'en', 'crawl', 49),
    (9012, '🚀 rocket 🧪 science a𝄞b 😀😀', 'xx', 'crawl', 16)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{d}/documents.parquet' (FORMAT PARQUET)""")

# ---- combined tier: every dirty table at once ------------------------
# Catches cross-tier interactions the per-tier sweeps can't see (e.g.
# a dirty doc joined against a dirty event in the xmodal queries).
d = os.path.join(DST, "all")
os.makedirs(d, exist_ok=True)
for t in ALL:
    src_tier = {"events": "events", "embeddings": "embeddings",
                "customer": "star", "orders": "star", "lineitem": "star",
                "documents": "docs"}.get(t)
    frm = os.path.join(DST, src_tier, f"{t}.parquet") if src_tier \
        else os.path.join(SRC, f"{t}.parquet")
    shutil.copy(frm, os.path.join(d, f"{t}.parquet"))

for tier in ["events", "embeddings", "star", "docs", "all"]:
    n = {}
    for t in ALL:
        p = os.path.join(DST, tier, f"{t}.parquet")
        n[t] = con.execute(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
    print(tier, {k: v for k, v in n.items() if v})
