package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level cache hygiene for the query-runner mains (Bench/Verify).
  *
  * Iterative operators (PPR, connected components, withSeqId) persist or
  * localCheckpoint intermediates; `spark.catalog.clearCache()` only drops
  * CacheManager entries, NOT checkpoint RDD blocks — over a 55-query run
  * those accumulate into executor-memory pressure. Clearing both between
  * queries keeps a long-lived driver flat.
  */
object Caches {

  /** Drop every cached DataFrame and every persisted / locally-checkpointed
    * RDD block. Safe only between queries (nothing in flight may still
    * depend on a truncated-lineage checkpoint). */
  def clearAll(spark: SparkSession): Unit = {
    // BM25's memoized index holds persisted frames AND driver-side scalars:
    // dropping the blocks below without evicting the map would leave stale
    // stats (and unpersisted frames) serving every later query
    graft.search.BM25.clearCache()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
