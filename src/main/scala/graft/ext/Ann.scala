package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * an IVF (inverted-file) variant — KMeans coarse quantizer, search only
  * the `nprobe` closest cells — as the scale path (cuts the candidate
  * set by ~nCells/nprobe at 100 TB).
  */
object Ann {

  /** Exact top-k by cosine: queries x corpus crossJoin + per-query
    * window. Deterministic tie-break on corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosineCol(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF top-k: assign corpus vectors to KMeans cells once, then search
    * only the nprobe closest cells per query. Returns the same schema as
    * [[bruteForceTopK]]; recall < 1 by construction. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int,
      seed: Long = 42L): DataFrame = {
    val toVec = udf((xs: Seq[Float]) => Vectors.dense(xs.map(_.toDouble).toArray))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"),
      toVec(col(vecCol)).as("__feat__"))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__feat__").setPredictionCol("__cell__")
    val model = km.fit(cv)
    val assigned = model.transform(cv).select(
      col("neighbor_id"), col("cv"), col("__cell__")).cache()

    val centers = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }.toSeq
    val centersDf = queries.sparkSession.createDataFrame(centers)
      .toDF("__cell__", "center")

    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    // nprobe closest cells per query (centers table is tiny)
    val qCells = q.crossJoin(broadcast(centersDf))
      .withColumn("cdist", Dedup.cosineCol(col("qv"), col("center")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("__cell__"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("__cell__"))

    qCells.join(assigned, "__cell__")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosineCol(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
