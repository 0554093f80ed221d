package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recentered Influence Function transform for a quantile
  * (`oaxaca_blinder/src/math/rif.rs:14-88`):
  * RIF(y; q_tau) = q_tau + (tau - 1{y <= q_tau}) / f_hat(q_tau),
  * with q_tau the R type-7 sample quantile and f_hat a one-point Gaussian
  * KDE with the rif.rs Silverman bandwidth (IQR via ceil-index selection,
  * 1e-8 density floor).
  */
object Rif {

  /** Per-group scalar inputs of the transform. */
  final case class GroupRif(level: String, n: Long, qTau: Double,
      bandwidth: Double, density: Double)

  /** Compute RIF of `outcome` separately within each level of
    * `groupCol`, appending it as `outCol`. Three aggregate passes total
    * (moments+quantile, IQR rank-pick, one-point density), each fully
    * distributed; only per-group scalars reach the driver. */
  def transformPerGroup(df: DataFrame, outcome: String, groupCol: String,
      tau: Double, outCol: String = "__rif__"): (DataFrame, Seq[GroupRif]) = {
    val y = col(outcome).cast("double")
    val g = col(groupCol).cast("string")

    // pass 1: n, sample stddev, type-7 quantile per group. stddev_samp
    // (and percentile on an all-null group) return null for n < 2 — read
    // with null guards so single-row levels take the n<2 passthrough
    // below instead of NPE-ing here (reference rif.rs returns the series
    // unchanged for them)
    val stats = df.groupBy(g.as("g"))
      .agg(count(y).as("n"), stddev_samp(y).as("std"),
        expr(s"percentile($outcome, ${tau}D)").as("q"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3))))
      .toMap

    // pass 2: IQR via the rif.rs ceil-index convention
    // q75 = sorted[max(ceil(0.75 n), 1) - 1] (0-based), same for q25.
    // Rank-pick by the value-bucketed prefix-count (`Windows
    // .valuesAtRanks`) per group — a partitionBy(group) window would
    // sort each group in ONE task, which dies at scale; the bucketed
    // rank pick stays parallel and never re-executes a sort.
    def rifIdx(n: Long, p: Double): Long = {
      val i = math.ceil(p * n).toLong
      math.min(if (i == 0) 0 else i - 1, n - 1) // 0-based
    }
    val bandwidths = stats.map { case (lvl, (n, std, _)) =>
      if (n < 2) {
        // these groups take the passthrough in the final expression —
        // skip the rank jobs (and the rifIdx(0,.) = -1 lookup an
        // all-null-outcome group would hit); any positive placeholder works
        lvl -> 1.0
      } else {
        val wanted = Set(rifIdx(n, 0.25), rifIdx(n, 0.75))
        val vals = graft.core.Windows.valuesAtRanks(
          df.filter(g === lit(lvl)), y, wanted)
        val q25 = vals(rifIdx(n, 0.25))
        val q75 = vals(rifIdx(n, 0.75))
        val iqr = q75 - q25
        val minSpread0 = if (iqr > 1e-8) math.min(std, iqr / 1.34) else std
        val minSpread = if (minSpread0 < 1e-8) 1.0 else minSpread0
        lvl -> 0.9 * minSpread * math.pow(n.toDouble, -0.2)
      }
    }

    // pass 3: one-point density at q_tau per group
    val qOf = caseOver(g, stats.map { case (l, (_, _, q)) => l -> q })
    val hOf = caseOver(g, bandwidths.toSeq)
    val densities = df
      .select(g.as("g"), (Kde.gaussianCol((qOf - y) / hOf)).as("k"))
      .groupBy(col("g")).agg(sum(col("k")).as("sk"))
      .collect()
      .map { r =>
        val lvl = r.getString(0)
        val (n, _, _) = stats(lvl)
        val d = r.getDouble(1) / (n.toDouble * bandwidths(lvl))
        lvl -> math.max(d, 1e-8)
      }.toMap

    val fOf = caseOver(g, densities.toSeq)
    val rif = when(qOf.isNull, y).otherwise(
      qOf + (lit(tau) - when(y <= qOf, 1.0).otherwise(0.0)) / fOf)
    // n < 2: reference returns the series unchanged
    val small = stats.collect { case (l, (n, _, _)) if n < 2 => l }.toSeq
    val rifFinal = if (small.isEmpty) rif else
      when(g.isin(small: _*), y).otherwise(rif)

    val info = stats.toSeq.sortBy(_._1).map { case (l, (n, _, q)) =>
      GroupRif(l, n, q, bandwidths(l), densities(l))
    }
    (df.withColumn(outCol, rifFinal), info)
  }

  /** Per-level scalar lookup as a when/otherwise chain (few levels). */
  private def caseOver(g: Column, values: Iterable[(String, Double)]): Column =
    values.foldLeft(lit(null).cast("double")) { case (acc, (lvl, v)) =>
      when(g === lit(lvl), lit(v)).otherwise(acc)
    }
}
