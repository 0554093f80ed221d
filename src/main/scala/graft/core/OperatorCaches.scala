package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded lifecycle for operator-internal materializations.
  *
  * Several operators materialize a shared intermediate — the (doc, term)
  * reduction in [[graft.ext.Relevance]], the tokenized projection in
  * [[graft.ext.Sampling.tokenBudgetSample]] — because two branches of the
  * returned plan consume it and recomputation would mean a second full
  * corpus pass. `localCheckpoint` would pin those blocks in the block
  * manager for the session lifetime (unbounded growth under repeated
  * calls), so this registry persists at MEMORY_AND_DISK instead and frees
  * every PRIOR call's frames when the next operator call registers new
  * ones, bounding live storage to one call's working set.
  *
  * Freeing is safe even if a caller consumes a stale result afterwards:
  * unlike `localCheckpoint`, `persist` keeps the lineage, so a read after
  * eviction silently recomputes instead of failing — the result is merely
  * slower, never wrong. Callers that interleave construction of several
  * operator results before consuming them should consume each result (or
  * copy it out) before building the next.
  */
object OperatorCaches {
  private val registered = new ConcurrentLinkedQueue[DataFrame]()

  /** Frees all frames registered by prior operator calls. Call once at
    * operator entry, before registering this call's materializations.
    * Logs what it frees (via the Spark logger, WARN on the
    * `graft.core.OperatorCaches` category): a caller that interleaves
    * two operator builds before consuming either triggers a silent
    * full-corpus recompute — correct via lineage, but the log line is
    * the only way to SEE the one-live-call constraint being violated. */
  def supersede(): Unit = {
    var df = registered.poll()
    var n = 0
    while (df != null) {
      if (df.storageLevel != StorageLevel.NONE) n += 1
      df.unpersist(blocking = false)
      df = registered.poll()
    }
    if (n > 0)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"superseding $n live operator materialization(s); a " +
          "subsequent read of a prior operator's result will recompute " +
          "its corpus pass")
  }

  /** Persist `df` (MEMORY_AND_DISK) and register it for freeing by the
    * next [[supersede]]. Lazy: the first consuming action materializes
    * it; later branches of the same plan read the cache. */
  def register(df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    registered.add(cached)
    cached
  }
}
