#!/usr/bin/env python3
"""Derive a 10x scale-up (sf1) of the driver's sf0.1 testdata.

The driver only generates up to sf0.1 (600k lineitem rows); the scale
validation the round-8 verdict asks for needs ~6M. Copy 0 is the
original data verbatim; copies 1..9 are key-offset replicas:

- fact/dim keys shift by copy * (max_key + 1), preserving every FK
  relationship and per-key densities (joins scale, skew shape is kept);
- document TEXT is word-permuted per copy with a coprime stride, so
  within-copy near-dup structure is preserved exactly (the same
  permutation applies to every doc of a copy) while cross-copy shingle
  overlap collapses — a naive 10x clone would explode the near-dup
  pair count ~100x, which no real 10x corpus does;
- embeddings are dimension-permuted + sign-flipped per copy (an
  orthogonal transform: intra-copy geometry exact, cross-copy cosine
  decorrelated), same reasoning.

Driver-side tooling only (duckdb/pyarrow are NOT library deps).
Usage: python3 tools/make_sf1.py [factor] [src_dir] [out_dir]
"""
import sys
import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata_sf1"

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def src(t):
    return f"'{SRC}/{t}.parquet'"


def key_max(t, c):
    return con.execute(f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]


MAXO = key_max("orders", "o_orderkey")
MAXC = key_max("customer", "c_custkey")
MAXS = key_max("supplier", "s_suppkey")
MAXP = key_max("part", "p_partkey")
MAXE = key_max("events", "event_id")
MAXU = key_max("events", "user_id")
MAXD = key_max("documents", "doc_id")
MAXV = key_max("embeddings", "vec_id")


def scale(table, select_tmpl):
    """Union FACTOR key-offset copies of `table` (i = copy index)."""
    parts = [select_tmpl.format(i=i) for i in range(FACTOR)]
    q = " UNION ALL ".join(f"SELECT {p} FROM {src(table)}" for p in parts)
    con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n0 = con.execute(f"SELECT count(*) FROM {src(table)}").fetchone()[0]
    n1 = con.execute(
        f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    assert n1 == FACTOR * n0, (table, n0, n1)
    print(f"{table}: {n0} -> {n1}")


# tiny dims: verbatim
for t in ("region", "nation"):
    con.execute(
        f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

scale("customer",
      f"c_custkey + {{i}} * {MAXC} AS c_custkey, "
      "c_name || (CASE WHEN {i} = 0 THEN '' ELSE '#' || {i} END) AS c_name, "
      "c_nationkey, c_acctbal, c_mktsegment")
scale("supplier",
      f"s_suppkey + {{i}} * {MAXS} AS s_suppkey, "
      "s_name || (CASE WHEN {i} = 0 THEN '' ELSE '#' || {i} END) AS s_name, "
      "s_nationkey, s_acctbal")
scale("part",
      f"p_partkey + {{i}} * {MAXP} AS p_partkey, "
      "p_name || (CASE WHEN {i} = 0 THEN '' ELSE '#' || {i} END) AS p_name, "
      "p_brand, p_type, p_size, p_retailprice")
scale("orders",
      f"o_orderkey + {{i}} * {MAXO} AS o_orderkey, "
      f"o_custkey + {{i}} * {MAXC} AS o_custkey, "
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
scale("lineitem",
      f"l_orderkey + {{i}} * {MAXO} AS l_orderkey, "
      f"l_partkey + {{i}} * {MAXP} AS l_partkey, "
      f"l_suppkey + {{i}} * {MAXS} AS l_suppkey, "
      "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
      "l_returnflag, l_linestatus, l_shipdate")
scale("events",
      f"event_id + {{i}} * {MAXE} AS event_id, ts, "
      f"user_id + {{i}} * {MAXU} AS user_id, "
      "event_type, value, props")

# documents: coprime-stride word permutation per copy (identical
# permutation within a copy -> near-dup pairs survive; different
# permutations across copies -> 3-gram shingle overlap collapses)
#
# One DISTINCT odd prime stride per copy, generated for any FACTOR: a
# fixed 10-entry list reused modulo its length gives copies i and i+10
# IDENTICAL permutations (exact cross-copy duplicates), and running this
# tool on its own output composes strides multiplicatively, so repeated
# products (s_i * s_j == s_j * s_i) silently collapse copies — the
# first sf10 attempt produced 1.44M exact-dup pairs instead of ~28k.
# Scale DIRECTLY from the driver's sf0.1 with the factor you want.


def _primes(count, start=7):
    out, c = [], start
    while len(out) < count:
        if all(c % q for q in range(3, int(c ** 0.5) + 1, 2)):
            out.append(c)
        c += 2
    return out


STRIDES = [1] + _primes(max(FACTOR, 16))  # stride for copy i (copy 0 = 1)
doc_parts = []
for i in range(FACTOR):
    if i == 0:
        doc_parts.append(f"SELECT * FROM {src('documents')}")
    else:
        s = STRIDES[i]
        # permute word list by j -> (j * s + i) % n (bijective when
        # gcd(s, n) = 1; duckdb lists are 1-based). Non-coprime n just
        # repeats some words — fine for a synthetic corpus. The + i
        # ROTATION matters: docs are only ~50 words, so distinct prime
        # strides still collide mod n (47 = 7 mod 40 -> identical
        # permutation -> exact cross-copy duplicates); two copies only
        # collide if BOTH s and i coincide mod n.
        doc_parts.append(f"""
          SELECT doc_id + {i} * {MAXD} AS doc_id,
                 array_to_string(
                   list_transform(range(0, len(w)),
                     j -> w[1 + (j * {s} + {i}) % len(w)]), ' ') AS text,
                 lang, source, n_chars
          FROM (SELECT doc_id, string_split(text, ' ') AS w, lang, source,
                       n_chars
                FROM {src('documents')})""")
q = " UNION ALL ".join(doc_parts)
con.execute(f"""COPY (SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
                 FROM ({q})) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
print("documents:",
      con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'")
      .fetchone()[0])

# embeddings: per-copy orthogonal transform (coprime dim stride + sign
# flips) — norms and within-copy cosines exact, cross-copy decorrelated
dim = con.execute(
    f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1").fetchone()[0]
emb_parts = []
for i in range(FACTOR):
    if i == 0:
        emb_parts.append(f"SELECT * FROM {src('embeddings')}")
    else:
        s = STRIDES[i] if i < len(STRIDES) else STRIDES[-1]
        emb_parts.append(f"""
          SELECT vec_id + {i} * {MAXV} AS vec_id,
                 list_transform(range(0, {dim}),
                   j -> embedding[1 + (j * {s}) % {dim}] *
                        (CASE WHEN (j + {i}) % 2 = 0 THEN 1 ELSE -1 END))
                   AS embedding,
                 label
          FROM {src('embeddings')}""")
q = " UNION ALL ".join(emb_parts)
con.execute(f"""COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding,
                 label FROM ({q}))
                 TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
print("embeddings:",
      con.execute(f"SELECT count(*) FROM '{OUT}/embeddings.parquet'")
      .fetchone()[0])
print("done:", OUT)
