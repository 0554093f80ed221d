package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the pre-training hygiene step: flag (and
  * drop) every corpus document that shares at least one n-token shingle
  * with an evaluation benchmark, so test questions don't leak into the
  * training set.
  *
  * Scale shape: the benchmark is eval-set sized — thousands of rows
  * against a 100 TB corpus — so its DISTINCT shingle set is
  * BROADCAST-joined against the streamed corpus shingles: the corpus
  * side is never shuffled, the whole operator is one scan + map-side
  * hash probe + one aggregation of the (tiny) hit set. The corpus
  * shingle explode reuses [[Dedup.shingles]], which already fans a
  * low-parallelism scan out by id hash before the per-row transform.
  */
object Decontam {

  /** One row per CONTAMINATED corpus document:
    * `(idCol, n_hits, n_bench_docs, first_bench_doc)` where n_hits
    * counts matching (corpus-shingle, benchmark-doc) pairs — both sides
    * are distinct-per-doc, so the count is content-determined —
    * n_bench_docs the distinct benchmark documents hit, and
    * first_bench_doc the smallest matching benchmark id (a
    * deterministic witness for audit).
    *
    * The benchmark side MUST be small (it is collected into a broadcast
    * hash table); that is the operator's contract, not a tuning knob. */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, "shingle length must be positive")
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, n)
    val benchSh = Dedup.shingles(bench, benchIdCol, benchTextCol, n)
      .select(col("shingle"), col(benchIdCol).as("__bench_id__"))
    corpusSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("__bench_id__")).as("n_bench_docs"),
        min(col("__bench_id__")).as("first_bench_doc"))
  }

  /** The clean corpus: every input column, minus the flagged documents
    * (left-anti join against the flag set, which is hit-set sized). */
  def removeContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8): DataFrame =
    corpus.join(
      flagContaminated(corpus, idCol, textCol, bench, benchIdCol,
        benchTextCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")
}
