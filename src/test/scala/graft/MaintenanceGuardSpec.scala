package graft

import org.apache.spark.sql.functions._
import graft.sources.{MaintenanceIds, Store}

/** Pins the backfill guard on the maintenance id collect (r12 verdict #5):
  * a batch carrying more distinct ids than `graft.maintenance.maxBatchIds`
  * fail-louds with "route through build" in ALL THREE index families —
  * incremental maintenance materializes the batch ids on the driver, which
  * is sound for micro-batches and a heap bomb for a mis-routed bulk
  * backfill. */
class MaintenanceGuardSpec extends SparkSpec {

  import spark.implicits._

  private def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  test("a batch past the id cap fail-louds in all three families; under it passes") {
    val bm25Path = "/root/repo/target/tmp/guard_bm25"
    val ivfPath = "/root/repo/target/tmp/guard_ivf"
    val lshPath = "/root/repo/target/tmp/guard_lsh"
    Seq(bm25Path, ivfPath, lshPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window seed", v(1, 0)),
      (2L, "spark window agg join", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    graft.dedup.LshIndex.build(seed.select("id", "text"), lshPath)
    val big = (10L to 13L).map(i => (i, s"text window number $i", v(0.6, 0.8)))
      .toDF("id", "text", "embedding")
    spark.conf.set(MaintenanceIds.MaxBatchIdsKey, "3")
    try {
      val e1 = intercept[IllegalArgumentException] {
        graft.search.BM25Index.refresh(spark, bm25Path, big)
      }
      assert(e1.getMessage.contains("route through build"))
      val e2 = intercept[IllegalArgumentException] {
        graft.ann.IvfIndex.refresh(spark, ivfPath, big)
      }
      assert(e2.getMessage.contains("route through build"))
      val e3 = intercept[IllegalArgumentException] {
        graft.dedup.LshIndex.refresh(spark, lshPath, big.select("id", "text"))
      }
      assert(e3.getMessage.contains("route through build"))
      // none of the failed calls moved an index
      assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 2L)
      assert(Store.load(spark, s"$ivfPath/assignments").count() == 2L)
      // a batch AT the cap still lands
      graft.search.BM25Index.refresh(spark, bm25Path,
        big.filter(col("id") <= 12L))
      assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 5L)
    } finally spark.conf.unset(MaintenanceIds.MaxBatchIdsKey)
  }

  test("the ingest-gate probe frame past the broadcast cap falls back to a shuffle join with identical output") {
    val ivfPath = "/root/repo/target/tmp/guard_probecap_ivf"
    Store.deleteRecursive(ivfPath)
    val seed = (1L to 8L).map(i =>
        (i, if (i % 2 == 0) v(1, 0.1 * i) else v(0.1 * i, 1)))
      .toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    val queries = Seq((100, v(0.9, 0.3)), (101, v(0.2, 0.95)), (102, v(0.7, 0.7)))
      .toDF("qid", "qv")
    def run() = graft.ann.IvfIndex
      .probedCandidatesBatch(spark, ivfPath, queries, nprobe = 2)
      .select("qid", "id", "ivf_cell", "sim")
      .as[(Int, Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
    val broadcasted = run()
    // 3 qids × nprobe 2 = 6 probe rows > cap 1 ⇒ the shuffle-join path;
    // output must be row-identical (the cap is a plan-shape guard, never
    // a semantic one)
    spark.conf.set(graft.ann.IvfIndex.GateMaxProbeRowsKey, "1")
    try assert(run().sameElements(broadcasted),
      "shuffle-join fallback diverged from the broadcast plan")
    finally spark.conf.unset(graft.ann.IvfIndex.GateMaxProbeRowsKey)
  }

  test("the shuffle fallback pre-salts a planted hot cell across reducers") {
    // r14 verdict #6: past the cap, a cell every qid probes would land its
    // whole |qids| × |cell| product on ONE reducer under a plain
    // repartition(ivf_cell) join. The fallback salts the corpus side by
    // hash(id) and replicates the probe frame GateFallbackSalts×, so the
    // hot cell's output spreads over GateFallbackSalts tasks — pinned here
    // by (a) row-identity with the broadcast plan and (b) the salt key in
    // the physical join, with ~80% of the corpus planted in one cell and
    // every query probing it first.
    val ivfPath = "/root/repo/target/tmp/guard_hotcell_ivf"
    Store.deleteRecursive(ivfPath)
    // 40 of 50 rows in cell 0 (the hot cell); every query vector points
    // at cell 0 first, cell 1 second
    val seed = ((1L to 40L).map(i => (i, v(1, 0.001 * i))) ++
      (41L to 50L).map(i => (i, v(0.001 * i, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    val queries = (100 to 105).map(q => (q, v(0.95, 0.05 * (q - 99))))
      .toDF("qid", "qv")
    def frame() = graft.ann.IvfIndex
      .probedCandidatesBatch(spark, ivfPath, queries, nprobe = 2)
    def rows() = frame().select("qid", "id", "ivf_cell", "sim")
      .as[(Int, Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
    val broadcasted = rows()
    spark.conf.set(graft.ann.IvfIndex.GateMaxProbeRowsKey, "1")
    try {
      assert(rows().sameElements(broadcasted),
        "salted fallback diverged from the broadcast plan")
      val plan = frame().queryExecution.executedPlan.toString
      assert(plan.contains("_salt"),
        s"past-cap fallback must join on the salt key:\n$plan")
    } finally spark.conf.unset(graft.ann.IvfIndex.GateMaxProbeRowsKey)
  }
}
