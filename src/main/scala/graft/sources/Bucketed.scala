package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the storage-side half of shuffle elimination.
  *
  * A 100 TB corpus that is joined on `id` every query (memories ⋈ feedback,
  * memories ⋈ retrieval_log, corpus ⋈ dedup verdicts) should be WRITTEN
  * pre-hashed: `bucketBy(n, id)` persists the hash partitioning into the
  * table metadata, so a join of two tables bucketed on the same key by the
  * same bucket count plans as a zipped per-bucket join — no Exchange on
  * either side, ever (BucketedJoinSpec pins the plan). This is the durable
  * form of the transient `repartition` the operators use mid-query.
  *
  * Spark constraint (public API): bucketed writes go through the catalog
  * (`saveAsTable`), not plain parquet paths — the bucket spec lives in
  * table metadata. The helpers below wrap that; the warehouse dir is the
  * session's `spark.sql.warehouse.dir`.
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (overwrite). */
  def save(df: DataFrame, table: String, bucketCol: String,
           numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
