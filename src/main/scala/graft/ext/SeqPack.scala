package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard LLM-training data
  * layout: documents are concatenated in a deterministic order and the
  * token stream is cut into fixed-length training sequences, so no
  * sequence has padding and a document may span two (or more)
  * consecutive sequences.
  *
  * Scale shape: packing is SHARDED. Each document hashes to one of
  * `numShards` independent token streams, so the prefix sum that places
  * it is a per-shard window — a partitioned window, never a single
  * global task — and shards are exactly the units a multi-worker
  * training job would consume. Within a shard the order is (id), so the
  * layout is a pure function of document CONTENT keys: reproducible on
  * any cluster, any partitioning, any retry (the same
  * determinism-via-content-hash contract as [[Sampling]]).
  *
  * All arithmetic is integer (token counts, exclusive prefix sums,
  * integer division) — results are exact, not FP-rounded.
  */
object SeqPack {

  /** One output row per (document, training sequence it overlaps):
    * `(idCol, shard, seq, tok_from, tok_to)` where `seq` is the
    * 0-based sequence index within the shard and `[tok_from, tok_to)`
    * is the DOC-RELATIVE token span landing in that sequence. Documents
    * with zero tokens occupy no space and are dropped. A document of
    * `nt` tokens appears in at most `nt / maxTokens + 1` rows, so the
    * explode is bounded and proportional to the data. */
  def pack(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, numShards: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(numShards > 0, "numShards must be positive")
    val nt = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val shard = pmod(TextAnalysis.hash56(col(idCol).cast("string")),
      lit(numShards.toLong))
    val in = df.select(col(idCol), nt.as("__nt__"), shard.as("__shard__"))
      .filter(col("__nt__") > 0L)
    // exclusive prefix sum of token counts within the shard — exact
    // long arithmetic over a PARTITIONED window (shard count bounds a
    // task's rows; raise numShards for bigger corpora)
    val w = Window.partitionBy(col("__shard__")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withStart = in.withColumn("__start__",
      coalesce(sum(col("__nt__")).over(w), lit(0L)))
    val L = maxTokens.toLong
    val firstSeq = expr(s"__start__ div ${L}L")
    val lastSeq = expr(s"(__start__ + __nt__ - 1) div ${L}L")
    withStart
      .withColumn("seq", explode(sequence(firstSeq, lastSeq)))
      .select(col(idCol), col("__shard__").as("shard"), col("seq"),
        greatest(col("seq") * L - col("__start__"), lit(0L)).as("tok_from"),
        (least((col("seq") + 1L) * L, col("__start__") + col("__nt__")) -
          col("__start__")).as("tok_to"))
  }
}
