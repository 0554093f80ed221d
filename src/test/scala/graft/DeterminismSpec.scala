package graft

import org.apache.spark.sql.Row

/** Cross-parallelism determinism as a FAILING TEST, not a convention:
  * every query in `SparkEntry.queries` must produce bit-identical rows
  * (order-insensitive) when the shuffle partitioning changes — the
  * in-JVM dimension of `tools/compare_runs.py` (which additionally
  * varies the master's thread count across processes). Partitioning-
  * dependent nondeterminism — range-sampling seeds leaking into
  * results, per-partition accumulation orders, arbitrary-tie windows —
  * shows up here as a value diff on SOME query.
  *
  * Doubles compare by RAW BITS (0.0 vs -0.0 and NaN payloads count as
  * diffs): the engine's discipline is bit-reproducibility, and the
  * oracle harness hash-compares at full precision. */
class DeterminismSpec extends SparkSpec {

  private def fmt(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double =>
      java.lang.Long.toHexString(
        java.lang.Double.doubleToRawLongBits(d.doubleValue))
    case f: java.lang.Float => fmt(java.lang.Double.valueOf(f.doubleValue))
    case r: Row => r.toSeq.map(fmt).mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case a: Array[_] => a.map(fmt).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, v2) => fmt(k) + "->" + fmt(v2) }
        .sorted.mkString("<", ",", ">")
    case other => other.toString
  }

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        // fresh operator state per pass: cached materializations from
        // the other parallelism level must not leak across
        Queries.clearSessionCaches()
        QueriesExt.clearSessionCaches()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val rows = fn(spark, sf("sf0.001")).collect()
        name -> rows.map(r => r.toSeq.map(fmt).mkString("|")).sorted.toSeq
      }.toMap
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("every query is value-identical at shuffle parallelism 4 vs 13") {
    val a = runAll(4)
    val b = runAll(13)
    assert(a.keySet == b.keySet)
    val diffs = a.keys.toSeq.sorted.filter(k => a(k) != b(k))
    val detail = diffs.headOption.map { k =>
      val onlyA = a(k).diff(b(k)).take(3)
      val onlyB = b(k).diff(a(k)).take(3)
      s"${diffs.size} nondeterministic queries: $diffs\n" +
        s"$k rows=${a(k).size}/${b(k).size}\n only@4: $onlyA\n only@13: $onlyB"
    }.getOrElse("")
    assert(diffs.isEmpty, detail)
  }
}
