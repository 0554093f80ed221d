package graft.estimators

import breeze.linalg.DenseVector
import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AKM (Abowd–Kramarz–Margolis) two-way fixed effects
  * (`oaxaca_blinder/src/akm.rs`):
  * largest connected set over the worker–firm bipartite graph, FWL
  * zig-zag demeaning of y and controls, OLS on the demeaned system,
  * alternating-projection recovery of worker/firm effects with the
  * first-firm normalization, and R^2 against total y variance.
  *
  * Distributed re-expression: union-find becomes min-label propagation
  * over the distinct edge table; each zig-zag iteration is two
  * groupBy-avg + join rounds over the observation table, with
  * `localCheckpoint` per iteration to cut lineage — no per-node state on
  * the driver.
  */
final case class AkmResult(
    beta: DenseVector[Double],
    controlNames: Seq[String],
    workerEffects: DataFrame, // (workerCol, effect)
    firmEffects: DataFrame,   // (firmCol, effect)
    r2: Double,
    nObs: Long)

object Akm {

  /** Rows restricted to the largest connected worker-firm component
    * (`akm.rs:151-234`); component size counted in NODES. Min-label
    * propagation converges in O(component diameter) rounds; like the
    * reference's ConvergenceFailed paths, iteration exhaustion throws
    * instead of silently proceeding with wrong component labels. */
  def largestConnectedSet(df: DataFrame, workerCol: String,
      firmCol: String, maxIters: Int = 200): DataFrame = {
    val w = col(workerCol).cast("string")
    val f = col(firmCol).cast("string")
    val edges = df.select(w.as("w"), f.as("f")).na.drop().distinct()
      .localCheckpoint()

    // node labels: start as the node's own key; propagate min through edges
    var wLab = edges.select(col("w")).distinct()
      .withColumn("lab", concat(lit("w:"), col("w"))).localCheckpoint()
    var fLab = edges.select(col("f")).distinct()
      .withColumn("lab", concat(lit("f:"), col("f"))).localCheckpoint()

    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      iters += 1
      val fCand = edges.join(wLab, "w").groupBy(col("f"))
        .agg(min(col("lab")).as("cand"))
      val fNew = fLab.join(fCand, Seq("f"), "left")
        .select(col("f"), least(col("lab"), coalesce(col("cand"), col("lab"))).as("lab"),
          (col("cand").isNotNull && col("cand") < col("lab")).as("chg"))
        .localCheckpoint()
      val wCand = edges.join(fNew.select(col("f"), col("lab")), "f")
        .groupBy(col("w")).agg(min(col("lab")).as("cand"))
      val wNew = wLab.join(wCand, Seq("w"), "left")
        .select(col("w"), least(col("lab"), coalesce(col("cand"), col("lab"))).as("lab"),
          (col("cand").isNotNull && col("cand") < col("lab")).as("chg"))
        .localCheckpoint()
      // one action for both change counts (the inputs are checkpointed)
      changed = fNew.select(col("chg")).unionByName(wNew.select(col("chg")))
        .filter(col("chg")).count()
      wLab = wNew.drop("chg")
      fLab = fNew.drop("chg")
    }
    if (changed > 0)
      throw ConvergenceFailed("largest_connected_set label propagation " +
        s"failed to converge within $maxIters iterations")

    // largest component by node count (workers + firms)
    val sizes = wLab.select(col("lab")).unionByName(fLab.select(col("lab")))
      .groupBy(col("lab")).agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("lab")).limit(1)
    val top = sizes.collect()
    if (top.isEmpty) throw InsufficientData("Empty graph")
    val topLab = top(0).getString(0)
    val keepW = wLab.filter(col("lab") === lit(topLab)).select(col("w"))
    df.join(broadcast(keepW), w === col("w"), "left_semi")
  }

  def run(df: DataFrame, outcome: String, workerCol: String, firmCol: String,
      controls: Seq[String] = Nil, tolerance: Double = 1e-8,
      maxIters: Int = 1000): AkmResult = {
    val connected = largestConnectedSet(df, workerCol, firmCol)
    if (connected.isEmpty) throw InsufficientData("No connected set found")
    solve(connected, outcome, workerCol, firmCol, controls, tolerance, maxIters)
  }

  private def solve(df: DataFrame, outcome: String, workerCol: String,
      firmCol: String, controls: Seq[String], tol: Double,
      maxIters: Int): AkmResult = {
    val vecCols = "__v0__" +: controls.indices.map(i => s"__v${i + 1}__")
    val obs = df.select(
      (col(workerCol).cast("string").as("w") +:
        col(firmCol).cast("string").as("f") +:
        col(outcome).cast("double").as("__v0__") +:
        controls.zipWithIndex.map { case (c, i) =>
          coalesce(col(c).cast("double"), lit(0.0)).as(s"__v${i + 1}__")
        }): _*).localCheckpoint()
    val nObs = obs.count()

    // When the effect tables (one row per worker/firm) are small, force
    // broadcast so each zig-zag iteration avoids reshuffling the full
    // observation table; beyond the threshold fall back to shuffle joins.
    val nWorkers = obs.select(col("w")).distinct().count()
    val nFirms = obs.select(col("f")).distinct().count()
    val bcastLimit = 2000000L
    def maybeBroadcast(d: DataFrame, n: Long): DataFrame =
      if (n <= bcastLimit) broadcast(d) else d

    // --- zig-zag demeaning of all vectors at once (`akm.rs:452-527`) ---
    // Convergence is tested every `checkEvery` iterations (linear-rate
    // loop, so at most checkEvery-1 surplus iterations past the fixpoint)
    // — non-check iterations carry no prev columns and run no diff scan,
    // cutting the per-iteration action count by ~a third.
    val checkEvery = 3
    var cur = obs
    var iter = 0
    var maxDiff = tol + 1.0
    while (maxDiff > tol && iter < maxIters) {
      iter += 1
      val check = iter % checkEvery == 0 || iter == maxIters
      val withPrev =
        if (check) cur.select((col("w") +: col("f") +:
          (vecCols.map(col) ++ vecCols.map(c => col(c).as(s"${c}p")))): _*)
        else cur
      val keepPrev: Seq[org.apache.spark.sql.Column] =
        if (check) vecCols.map(c => col(s"${c}p")) else Nil
      val wMeans = withPrev.groupBy(col("w"))
        .agg(vecCols.map(c => avg(col(c)).as(s"${c}m")).head,
          vecCols.tail.map(c => avg(col(c)).as(s"${c}m")): _*)
      val deW = withPrev.join(maybeBroadcast(wMeans, nWorkers), "w")
        .select((col("w") +: col("f") +:
          (vecCols.map(c => (col(c) - col(s"${c}m")).as(c)) ++ keepPrev)): _*)
      val fMeans = deW.groupBy(col("f"))
        .agg(vecCols.map(c => avg(col(c)).as(s"${c}m")).head,
          vecCols.tail.map(c => avg(col(c)).as(s"${c}m")): _*)
      val deF = deW.join(maybeBroadcast(fMeans, nFirms), "f")
        .select((col("w") +: col("f") +:
          (vecCols.map(c => (col(c) - col(s"${c}m")).as(c)) ++ keepPrev)): _*)
        .localCheckpoint()
      if (check) {
        val diffs = deF.agg(
          vecCols.map(c => sum(pow(col(c) - col(s"${c}p"), 2)).as(s"${c}d")).head,
          vecCols.tail.map(c => sum(pow(col(c) - col(s"${c}p"), 2)).as(s"${c}d")): _*)
          .head()
        maxDiff = vecCols.indices.map(i => math.sqrt(diffs.getDouble(i))).max
      }
      cur = deF.select((col("w") +: col("f") +: vecCols.map(col)): _*)
    }
    if (iter >= maxIters)
      throw ConvergenceFailed(
        s"demean_vector failed to converge within $maxIters iterations")

    // --- OLS on demeaned (no intercept, `akm.rs:347-367`) ---
    val beta =
      if (controls.isEmpty) DenseVector.zeros[Double](0)
      else {
        val g = Gram.compute(cur, "__v0__", vecCols.tail)
        try LinAlg.cholSolve(g.xtx, g.xty)
        catch {
          case _: SingularMatrix =>
            throw ConvergenceFailed("OLS design matrix is singular")
        }
      }

    // --- recover fixed effects on r = y - X beta (`akm.rs:530-621`) ---
    val rCol =
      if (controls.isEmpty) col("__v0__")
      else col("__v0__") - vecCols.tail.zipWithIndex
        .map { case (c, i) => col(c) * lit(beta(i)) }.reduce(_ + _)
    val withR = obs.withColumn("__r__", rCol).localCheckpoint()

    var alpha = withR.select(col("w")).distinct()
      .withColumn("__a__", lit(0.0)).localCheckpoint()
    var psi = withR.select(col("f")).distinct()
      .withColumn("__p__", lit(0.0)).localCheckpoint()
    var feDiff = tol + 1.0
    var feIter = 0
    // same every-checkEvery convergence cadence as the zig-zag loop:
    // non-check iterations skip the old-value joins and the diff action
    while (feDiff > tol && feIter < maxIters) {
      feIter += 1
      val check = feIter % checkEvery == 0 || feIter == maxIters
      val aNew = withR.join(maybeBroadcast(psi, nFirms), "f").groupBy(col("w"))
        .agg(avg(col("__r__") - col("__p__")).as("__a2__"))
      if (check) {
        val aJ = alpha.join(aNew, "w")
          .select(col("w"), col("__a2__").as("__a__"),
            pow(col("__a2__") - col("__a__"), 2).as("__d__"))
          .localCheckpoint()
        val pNew = withR.join(maybeBroadcast(aJ.select(col("w"), col("__a__")), nWorkers), "w")
          .groupBy(col("f")).agg(avg(col("__r__") - col("__a__")).as("__p2__"))
        val pJ = psi.join(pNew, "f")
          .select(col("f"), col("__p2__").as("__p__"),
            pow(col("__p2__") - col("__p__"), 2).as("__d__"))
          .localCheckpoint()
        // one action for both step-size sums (the inputs are checkpointed)
        val dSum = aJ.select(col("__d__")).unionByName(pJ.select(col("__d__")))
          .agg(sum(col("__d__"))).head().getDouble(0)
        feDiff = math.sqrt(dSum)
        alpha = aJ.select(col("w"), col("__a__"))
        psi = pJ.select(col("f"), col("__p__"))
      } else {
        val aC = aNew.select(col("w"), col("__a2__").as("__a__"))
          .localCheckpoint()
        val pC = withR.join(maybeBroadcast(aC, nWorkers), "w")
          .groupBy(col("f")).agg(avg(col("__r__") - col("__a__")).as("__p__"))
          .localCheckpoint()
        alpha = aC
        psi = pC
      }
    }
    if (feIter >= maxIters)
      throw ConvergenceFailed(
        s"recover_fe failed to converge within $maxIters iterations")

    // first-firm normalization (sorted firm ids, `akm.rs:612-620`)
    val refVal = psi.orderBy(col("f")).limit(1).collect()(0).getDouble(1)
    val psiN = psi.withColumn("__p__", col("__p__") - lit(refVal))
    val alphaN = alpha.withColumn("__a__", col("__a__") + lit(refVal))

    // R^2
    val pred = withR.join(maybeBroadcast(alphaN, nWorkers), "w")
      .join(maybeBroadcast(psiN, nFirms), "f")
      .withColumn("__pred__",
        (if (controls.isEmpty) lit(0.0)
         else vecCols.tail.zipWithIndex
           .map { case (c, i) => col(c) * lit(beta(i)) }.reduce(_ + _)) +
          col("__a__") + col("__p__"))
    val stats = pred.agg(
      sum(pow(col("__v0__") - col("__pred__"), 2)).as("rss"),
      sum(pow(col("__v0__"), 2)).as("syy"),
      sum(col("__v0__")).as("sy"), count(lit(1)).as("n")).head()
    val rss = stats.getDouble(0)
    val tss = stats.getDouble(1) - stats.getDouble(2) * stats.getDouble(2) / stats.getLong(3)
    val r2 = 1.0 - rss / tss

    AkmResult(beta, controls,
      alphaN.select(col("w").as(workerCol), col("__a__").as("effect")),
      psiN.select(col("f").as(firmCol), col("__p__").as("effect")),
      r2, nObs)
  }
}
