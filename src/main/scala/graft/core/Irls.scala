package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-plan design cache for iteratively reweighted least squares.
  *
  * The per-iteration DataFrame route (build `z`/`w` columns with the
  * current beta as literals, run [[Gram.compute]]) re-enters Catalyst
  * every step: beta literals make every iteration's plan NEW, so each
  * scan pays analysis + whole-stage-codegen compilation (~100-300 ms of
  * driver fixed cost) before touching a row. A converging fit is 10-30
  * iterations — that fixed cost dominates small-scale fits and is pure
  * waste at any scale. Here the (y, w, x) projection is evaluated ONCE
  * through Catalyst (so pruning/pushdown still apply), converted to
  * primitive rows, and persisted; each iteration is then a plain
  * `treeAggregate` closure over the cached RDD with ZERO per-iteration
  * planning — the same structure Spark MLlib's own iterative optimizers
  * use (e.g. mllib LogisticRegression's treeAggregate loops).
  *
  * Bit-exactness: row order within partitions, partition count,
  * `treeAggregate` depth, and the accumulation order inside
  * [[GramBuffer]] all match the DataFrame route exactly, so fits are
  * bitwise identical to the per-iteration plans they replace (the
  * working-response arithmetic must be written in the same association
  * order as the Column expressions it mirrors — see the estimators).
  */
final class IrlsDesign(df: DataFrame, yCol: String, xCols: Seq[String],
    wCol: Option[String]) {

  val k: Int = xCols.size

  /** Row layout: [y, wBase, x_0 .. x_{k-1}]. */
  private val rows: RDD[Array[Double]] = {
    val w = wCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val proj = df.select(
      (col(yCol).cast("double") +: w +:
        xCols.map(c => col(c).cast("double"))): _*)
    val kk = k
    proj.queryExecution.toRdd.map { r =>
      if (r.anyNull)
        throw InvalidArgument(
          "IRLS design read a null model value; drop null rows first")
      val a = new Array[Double](2 + kk)
      a(0) = r.getDouble(0)
      a(1) = r.getDouble(1)
      var i = 0
      while (i < kk) { a(2 + i) = r.getDouble(2 + i); i += 1 }
      a
    }.persist(StorageLevel.MEMORY_AND_DISK)
  }

  import IrlsDesign.Buf

  /** ONE working-response Gram system at `beta`: for each row,
    * `working(y, wBase, xb, out)` writes out(0) = z (response) and
    * out(1) = w (weight); the design enters the normal equations
    * unchanged. Accumulates via [[GramBuffer.add]] — the exact shape of
    * the single-system [[Gram.compute]] pass. */
  def gram(beta: Array[Double])(
      working: (Double, Double, Double, Array[Double]) => Unit): GramResult = {
    val kk = k
    val res = rows.treeAggregate(new Buf(kk, 1))(
      seqOp = (buf, a) => {
        var xb = 0.0
        var i = 0
        while (i < kk) { xb += a(2 + i) * beta(i); i += 1 }
        working(a(0), a(1), xb, buf.zw)
        System.arraycopy(a, 2, buf.gb.xRow, 0, kk)
        buf.gb.add(0, buf.zw(0), buf.zw(1), buf.gb.xRow, Gram.oneRep)
        buf
      },
      combOp = (x, y) => x.merge(y),
      depth = 2)
    res.gb.result(0, 0)
  }

  /** Multi-system variant (one system per beta, e.g. one per tau): each
    * row contributes to every system via `working(y, wBase, xb_s, s,
    * out)`; systems with out(1) == 0 skip the row. Accumulates via
    * [[GramBuffer.addOne]] — the exact shape of [[Gram.computeMulti]].
    * Returns one [[GramResult]] per system. */
  def gramMulti(betas: Array[Array[Double]])(
      working: (Double, Double, Double, Int, Array[Double]) => Unit)
      : Array[GramResult] = {
    val kk = k
    val nSys = betas.length
    val res = rows.treeAggregate(new Buf(kk, nSys))(
      seqOp = (buf, a) => {
        System.arraycopy(a, 2, buf.gb.xRow, 0, kk)
        var s = 0
        while (s < nSys) {
          val b = betas(s)
          var xb = 0.0
          var i = 0
          while (i < kk) { xb += a(2 + i) * b(i); i += 1 }
          working(a(0), a(1), xb, s, buf.zw)
          if (buf.zw(1) != 0.0)
            buf.gb.addOne(0, s, buf.zw(0), buf.zw(1), buf.gb.xRow)
          s += 1
        }
        buf.gb.bumpLane(0)
        buf
      },
      combOp = (x, y) => x.merge(y),
      depth = 2)
    Array.tabulate(nSys)(s => res.gb.result(0, s))
  }

  def unpersist(): Unit = { rows.unpersist(blocking = false); () }
}

object IrlsDesign {
  /** Aggregation buffer: the Gram systems plus per-row scratch (safe —
    * treeAggregate applies seqOp serially per partition buffer). A
    * top-level class so closures never capture the design (and its
    * DataFrame) itself. */
  private final class Buf(kk: Int, nSys: Int) extends Serializable {
    val gb = new GramBuffer(kk, 1, nSys)
    val zw = new Array[Double](2)
    def merge(o: Buf): Buf = { gb.merge(o.gb); this }
  }
}
