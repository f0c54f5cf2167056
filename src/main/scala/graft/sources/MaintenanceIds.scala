package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one driver-side materialization every incremental index-maintenance
  * pass performs: a batch's DISTINCT ids, collected in ONE job so the
  * pruned-bucket reads and broadcast joins downstream can be planned
  * driver-side. Shared by all three index families (BM25 / IVF / LSH).
  *
  * The collect is sound ONLY because maintenance batches are micro-batch
  * bounded — so it is guarded: a batch carrying more distinct ids than
  * `graft.maintenance.maxBatchIds` (default 10⁶ ≈ tens of MB of driver
  * heap) fail-louds with "route through build" instead of silently
  * ballooning the driver. A bulk backfill mis-routed through refresh is
  * exactly the caller this guard exists to stop; the limit is a Spark conf
  * so a deployment with a bigger driver can raise it deliberately. The
  * guard costs nothing: the collect itself is capped at limit+1 rows. */
object MaintenanceIds {

  /** Conf key bounding the distinct ids one incremental maintenance batch
    * may carry. */
  val MaxBatchIdsKey = "graft.maintenance.maxBatchIds"
  val MaxBatchIdsDefault: Int = 1000000

  def collect(ids: DataFrame, failOnDup: Boolean, what: String,
              dupHint: String): Array[Long] = {
    val cap = ids.sparkSession.conf
      .get(MaxBatchIdsKey, MaxBatchIdsDefault.toString).toInt
    val rows = ids.groupBy("id").agg(count(lit(1)).as("c"))
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: batch carries more than $cap distinct ids — incremental " +
        "maintenance collects the batch ids to the driver, so a bulk " +
        "backfill this size must route through build (or raise " +
        s"$MaxBatchIdsKey deliberately)")
    if (failOnDup) {
      val dups = rows.filter(_.getLong(1) > 1)
      require(dups.isEmpty,
        s"$what: batch carries duplicate ids (e.g. ${dups.take(3).map(_.get(0)).mkString(", ")}) — $dupHint")
    }
    rows.map { r =>
      require(!r.isNullAt(0), s"$what: batch carries a null id")
      r.getLong(0)
    }
  }
}
