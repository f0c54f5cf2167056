package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * The headline set covers every operator family; the O(n²) exact-Jaccard
  * baseline (lsh_jaccard_exact) is excluded — its scalable form
  * (lsh_minhash_neardup) is what gets timed, the exact form exists for
  * correctness cross-checks at small SF.
  */
object Bench {
  private val Excluded = Set("lsh_jaccard_exact")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb session/codegen/JIT startup outside the timings
    try SparkEntry.queries("q1_lineitem_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // two timed runs per query, min reported: a contended machine inflates
    // individual runs by 2-4x (round-2 driver vs idle re-run), and the min
    // is the stable round-over-round signal. Caches (incl. checkpoint RDD
    // blocks) are dropped between runs so the second run isn't reading the
    // first run's persisted intermediates.
    // optional query-name subset (local dev loop); driver passes none
    val subset = args.toSet
    val results = SparkEntry.queries.view
      .filterKeys(n => !Excluded.contains(n) && (subset.isEmpty || subset(n))).toMap
      .map { case (name, fn) =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
          val dt = (System.nanoTime() - t0) / 1e9
          graft.core.Caches.clearAll(spark)
          // reclaim freed checkpoint/cache blocks NOW: in a 70+ query run the
          // deferred GC debt otherwise lands inside later queries' timings
          // (observed 3-4x inflation on late queries in a full run)
          System.gc()
          // a failed run's (typically fast) wall time must not win the min
          if (ok) dt else Double.MaxValue
        }
        // both runs failed -> -1 marks the query broken instead of reporting
        // the failure duration as a measurement
        name -> (if (times.min == Double.MaxValue) -1.0 else times.min)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
