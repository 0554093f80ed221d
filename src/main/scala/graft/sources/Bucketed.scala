package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed parquet sink: the write-side half of shuffle-free joins.
  *
  * A table written with `bucketBy(n, key)` + `sortBy(key)` is split
  * into n files per partition by `hash(key) % n`, each sorted on the
  * key; two tables bucketed the same way then join with NO exchange
  * and NO sort — at 100 TB this turns every repeated fact-to-fact join
  * on the same key (lineitem⋈orders every night) from the cluster's
  * biggest shuffle into a per-bucket merge. The write itself costs one
  * shuffle (that is the point: shuffle once at ingest, never again),
  * which is why this lives in the ingest path, not inside operators.
  *
  * Bucket metadata only exists in the catalog, so the sink goes through
  * `saveAsTable` with an explicit `path` (external table) — a plain
  * `.parquet(path)` write silently drops the bucket spec.
  */
object Bucketed {

  /** Write `df` as an external bucketed parquet table registered as
    * `table` at `path`. `sortCols` defaults to the bucket columns, so
    * bucket files are key-sorted and merge joins skip their sorts. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must not be empty")
    require(numBuckets > 0, "numBuckets must be positive")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
