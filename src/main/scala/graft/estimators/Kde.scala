package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gaussian kernel density estimation + Silverman bandwidth
  * (`oaxaca_blinder/src/math/kde.rs:20-59`).
  *
  * The grid evaluation is ONE `treeAggregate` pass accumulating all grid
  * sums per partition (no 100x explode, no collect of data). Weights are
  * normalized to 1 as in the reference.
  */
object Kde {

  private val InvSqrt2Pi = 1.0 / math.sqrt(2.0 * math.Pi)

  /** Density at each grid point: f(g) = sum_i w_i K((g - x_i)/h) / h,
    * with w normalized to sum 1 (uniform 1/n when wCol is None). */
  def onGrid(df: DataFrame, valueCol: String, wCol: Option[String],
      grid: Array[Double], bandwidth: Double): Array[Double] = {
    val w = wCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val proj = df.select(col(valueCol).cast("double"), w)
    val m = grid.length
    val zero = new Array[Double](m + 1) // grid sums ++ sum(w)
    val acc = proj.rdd.treeAggregate(zero)(
      seqOp = (buf, row) => {
        val x = row.getDouble(0)
        val wv = row.getDouble(1)
        var i = 0
        while (i < m) {
          val u = (grid(i) - x) / bandwidth
          buf(i) += wv * InvSqrt2Pi * math.exp(-0.5 * u * u)
          i += 1
        }
        buf(m) += wv
        buf
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val sw = acc(m)
    grid.indices.map(i => acc(i) / sw / bandwidth).toArray
  }

  /** Silverman's rule with the kde.rs index convention:
    * q1 = sorted[floor(0.25 n)], q3 = sorted[floor(0.75 n)] (0-based). */
  def silverman(df: DataFrame, valueCol: String): Double = {
    val v = col(valueCol).cast("double")
    val row = df.agg(count(v).as("n"), avg(v).as("mean"),
      var_samp(v).as("var")).head()
    val n = row.getLong(0)
    val std = math.sqrt(row.getDouble(2))
    val q1 = elementAtIndex(df, valueCol, (n * 0.25).toLong)
    val q3 = elementAtIndex(df, valueCol, (n * 0.75).toLong)
    val a = math.min(std, (q3 - q1) / 1.34)
    0.9 * a * math.pow(n.toDouble, -0.2)
  }

  /** 0-based element of the sorted column; distributed sort +
    * zipWithIndex, no driver collect of the data. */
  def elementAtIndex(df: DataFrame, valueCol: String, idx: Long): Double = {
    val i = math.max(idx, 0L)
    df.select(col(valueCol).cast("double")).sort(col(valueCol))
      .rdd.zipWithIndex().filter(_._2 == i).map(_._1.getDouble(0)).first()
  }

  def gaussianCol(u: Column): Column =
    lit(InvSqrt2Pi) * exp(u * u * lit(-0.5))
}
