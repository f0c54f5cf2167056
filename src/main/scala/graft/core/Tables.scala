package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every table is a plain parquet file under `sfDir`; reading through these
  * helpers keeps scans declarative so Catalyst pushes filters/column pruning
  * into the parquet reader.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** CPU fan-out for the single-file documents fixture: the driver's
    * parquet has ONE row group, so the scan arrives as one split and every
    * per-row kernel downstream (tokenize, shingle, embed) serializes onto
    * a single core — measured 6× of ta_bigram_nll's wall time at
    * local[32]. When scan parallelism is far below the cluster's,
    * hash-redistribute by the row key once (the whole table is ≤1 MB here,
    * so the exchange is noise); a real multi-file 100 TB table already
    * arrives with thousands of splits and takes the `else` branch
    * untouched. Applied to documents ONLY: the embeddings table's
    * consumers broadcast it or head() single rows, where an injected
    * exchange is pure overhead, and its kernel-heavy uses flow through the
    * memories join whose partitioning follows the documents side. The
    * split-count probe is memoized per path — `df.rdd` forces physical
    * planning, which should not rerun on every query. */
  // NOTE: fanOut's input is always a bare `load()` parquet scan (see the
  // two call sites), so the memoized `df.rdd` probe only plans the scan —
  // it never executes upstream stages. Derived frames must not be routed
  // through here (IndexBuild.lshNearDuplicates documents the trap).
  private val fanOutCache = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private def fanOut(df: DataFrame, key: String, cacheKey: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val few = fanOutCache.getOrElseUpdate(s"$cacheKey@$target",
      df.rdd.getNumPartitions * 4 <= target)
    if (few) df.repartition(target, org.apache.spark.sql.functions.col(key))
    else df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(load(spark, sfDir, "documents"), "doc_id", s"$sfDir/documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")

  /** `events.parquet` has shipped `ts` in two physical forms across driver
    * testdata generations: parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads under the legacy nanosAsLong conf (as an epoch-nanos Long), and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ. Normalize BOTH to a plain TimestampType column so every
    * downstream operator (`unix_micros`, watermarks, window ranges) sees
    * one type. The NTZ→LTZ cast interprets the wall-clock in the session
    * timezone — pinned to UTC in every entrypoint — so epoch micros equal
    * DuckDB's `epoch_us` on the same naive timestamp, exactly. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→LTZ cast below is only epoch-exact when the session zone is
    // UTC. REQUIRE it rather than set it: the cast resolves its zone
    // lazily at analysis time, so a save/restore would not scope it, and
    // silently mutating the session zone here would reconfigure every
    // subsequent query in the caller's session (ADVICE r7). Entrypoints
    // pin UTC at build; one that forgets must fail loudly, not shift µs.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC " +
        "(pin it in the SparkSession builder) — the NTZ→LTZ ts cast " +
        "would silently shift epoch micros under any other zone")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's
        // 2^53 mantissa, so float division is off by ±1µs on some rows;
        // DuckDB's TIMESTAMP_NS→µs conversion truncates, and so must this
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
}
