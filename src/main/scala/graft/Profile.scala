package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling main (not part of the driver contract): runs named
  * queries once (after the q1 warmup) and prints a per-JOB wall-time
  * breakdown — job id, duration, and the first line of the job's call site
  * — plus the gaps between jobs (driver-side planning/collect time). This
  * attributes a query's seconds to scheduler-visible work vs driver-side
  * think time, which the bench total alone cannot do (guide §1: measure
  * first, empirical loop).
  *
  * Usage: sbt "runMain graft.Profile r4_hybrid_rrf r10_graph_search"
  */
object Profile {
  private case class Job(id: Int, start: Long, var end: Long = -1L,
                         var site: String = "")

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
    // ad-hoc config experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, e.time)
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val d = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (d >= 0.3) {
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("Profile"))
            .getOrElse(si.name.takeWhile(_ != '\n')).trim.take(110)
          println(f"    stage ${si.stageId}%4d ${d}%6.2fs tasks=${si.numTasks}%4d  $site%s")
        }
      }
    })
    try SparkEntry.queries("q1_lineitem_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (name <- args) {
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.clearAll(spark)
      System.gc()
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      val jobSum = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
      println(f"== $name%s wall=$wall%.2fs jobs=${js.size}%d jobTime=$jobSum%.2fs gap=${wall - jobSum}%.2fs")
      var prevEnd = -1L
      js.foreach { j =>
        val d = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        if (d >= 0.05 || gap >= 0.05)
          println(f"  job ${j.id}%4d ${d}%6.2fs gapBefore=${gap}%5.2fs  ${j.site}%s")
        prevEnd = math.max(prevEnd, j.end)
      }
    }
    spark.stop()
  }
}
