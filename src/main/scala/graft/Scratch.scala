package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway bisection harness for optimization work (dev-only). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64kb"))
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.{Corpus, Tables}

    // warmup
    try SparkEntry.queries("q1_lineitem_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val docsFn = () => Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))

    import graft.text.TextAnalysis
    import graft.functions.TextFunctions
    time("tokens only") {
      noop(docsFn().select(size(TextFunctions.tokens(col("text"))).as("n")))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("langId only") {
      noop(docsFn().select(TextAnalysis.langId(col("text")).getField("lang").as("lang")))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("quality only") {
      noop(docsFn().select(TextAnalysis.qualityScore(col("text")).as("q")))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("tokenCounts only") {
      val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
      noop(docsFn().select(ws.as("ws"), bpe.as("bpe")))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("shingles only") {
      noop(docsFn().select(array_distinct(TextFunctions.shingleHashes(col("text"), 3)).as("sh")))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("profile.noop") {
      noop(graft.text.Curation.profile(docsFn()))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("profile+filter.noop") {
      val p = graft.text.Curation.profile(docsFn())
      noop(p.filter(col("lang") === "en" && col("quality") >= 0.5 && col("n_ws") >= 10))
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("..+dedupExact.noop") {
      val p = graft.text.Curation.profile(docsFn())
        .filter(col("lang") === "en" && col("quality") >= 0.5 && col("n_ws") >= 10)
      val e = graft.dedup.Dedup.dedupExact(
        p.withColumn("_norm", array_join(graft.functions.TextFunctions.tokens(col("text")), " ")),
        keyCol = "_norm")
      noop(e)
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("..+shingles.ckpt") {
      val p = graft.text.Curation.profile(docsFn())
        .filter(col("lang") === "en" && col("quality") >= 0.5 && col("n_ws") >= 10)
      val e = graft.dedup.Dedup.dedupExact(
        p.withColumn("_norm", array_join(graft.functions.TextFunctions.tokens(col("text")), " ")),
        keyCol = "_norm")
      val sh = graft.dedup.MinHashLsh.shingleSets(e, 3).localCheckpoint(true)
      noop(sh)
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("full curate.survivors.count") {
      graft.text.Curation.curate(docsFn()).survivors.count()
    }
    graft.core.Caches.clearAll(spark); System.gc()
    time("full curate again") {
      graft.text.Curation.curate(docsFn()).survivors.count()
    }
    spark.stop()
  }
}
