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

  /** Exact top-k by cosine. Physical plan: broadcast the corpus vectors,
    * stream the queries once, keep a per-query top-k selection in a tight
    * loop — no crossJoin materialization. Deterministic tie-break on
    * corpus id. (At 100 TB the corpus side is blocked by IVF cells —
    * [[ivfTopK]] — and this kernel runs per cell.) */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val cproj = corpus.select(col(idCol).cast("long"),
      transform(col(vecCol), x => x.cast("double")))
    val corp = cproj.collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      (r.getLong(0), v, math.sqrt(v.map(x => x * x).sum))
    }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corp)
    val qproj = queries.select(col(idCol).cast("long"),
      transform(col(vecCol), x => x.cast("double")))
    val rows = qproj.rdd.mapPartitions { it =>
      val c = bc.value
      it.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1).toArray
        val qn = math.sqrt(qv.map(x => x * x).sum)
        // (cosine desc, id asc) top-k
        val best = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by(t => (-t._1, t._2)))
        c.foreach { case (cid, cv, cn) =>
          if (cid != qid) {
            var dot = 0.0
            var i = 0
            while (i < qv.length) { dot += qv(i) * cv(i); i += 1 }
            val cos = dot / (qn * cn)
            if (best.size < k) best.enqueue((cos, cid))
            else {
              val worst = best.head
              if (cos > worst._1 || (cos == worst._1 && cid < worst._2)) {
                best.dequeue(); best.enqueue((cos, cid))
              }
            }
          }
        }
        best.toSeq.sortBy(t => (-t._1, t._2)).zipWithIndex.map {
          case ((cos, cid), i) => org.apache.spark.sql.Row(qid, i + 1, cid, cos)
        }
      }
    }
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
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
