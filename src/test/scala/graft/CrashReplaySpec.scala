package graft

import org.apache.spark.sql.functions._
import graft.search.{BM25, BM25Index}
import graft.sources.{FaultPoints, Store}
import graft.streaming.EventStream

/** Pins the r12-ADVICE crash windows closed: each index family publishes
  * its PRESENCE table first, so a crash between the table publishes of one
  * maintenance call followed by a foreachBatch re-delivery hits the
  * fail-loud already-indexed check instead of silently double-appending —
  * and the ambiguity guards on the CDC reduction (tied winning seq) and
  * token-less changed docs raise instead of corrupting N. */
class CrashReplaySpec extends SparkSpec {

  import spark.implicits._

  private def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

  private def crashAt(label: String): Unit =
    FaultPoints.install(l =>
      if (l == label) throw new RuntimeException(s"injected crash at $l"))

  private lazy val docs = Seq(
    (1L, "dup merge window spark"),
    (2L, "spark window agg join"),
    (3L, "dup dup shuffle merge"),
    (4L, "broadcast join plan"),
    (5L, "window spark spark dup")
  ).toDF("id", "text")

  private val query = Seq("dup", "spark", "window")

  private def scoreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("id", "bm25").as[(Long, Double)].collect().toMap

  test("BM25 refresh crash between presence and postings: the replay fail-louds") {
    val path = "/root/repo/target/tmp/crash_bm25"
    Store.deleteRecursive(path)
    BM25Index.build(docs.filter(col("id") <= 3), path)
    val batch = docs.filter(col("id") > 3)
    crashAt("bm25.refresh.afterPresence")
    try {
      val e = intercept[RuntimeException] { BM25Index.refresh(spark, path, batch) }
      assert(e.getMessage.contains("injected crash"))
    } finally FaultPoints.install(null)
    // foreachBatch re-delivers the batch: the presence rows landed before
    // the crash, so the replay must raise instead of appending the batch's
    // postings a second time (the silent double-tf corruption)
    val e2 = intercept[IllegalArgumentException] {
      BM25Index.refresh(spark, path, batch)
    }
    assert(e2.getMessage.contains("ALREADY indexed"))
    // readers resolve through the index manifest, which never advanced:
    // they still see exactly the pre-crash index
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25.scores(docs.filter(col("id") <= 3), query)))
  }

  test("IVF refresh crash between presence sidecar and assignments: the replay fail-louds") {
    val path = "/root/repo/target/tmp/crash_ivf"
    Store.deleteRecursive(path)
    val seed = Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"), path)
    val batch = Seq((3L, v(0.8, 0.6))).toDF("id", "embedding")
    crashAt("ivf.refresh.afterPresence")
    try {
      val e = intercept[RuntimeException] {
        graft.ann.IvfIndex.refresh(spark, path, batch)
      }
      assert(e.getMessage.contains("injected crash"))
    } finally FaultPoints.install(null)
    // replay: the ids sidecar already carries id 3 — raise, never a second
    // live assignment row per id
    val e2 = intercept[IllegalArgumentException] {
      graft.ann.IvfIndex.refresh(spark, path, batch)
    }
    assert(e2.getMessage.contains("ALREADY indexed"))
    // manifest-resolved readers still see the pre-crash index
    assert(graft.ann.IvfIndex.topK(spark, path, Seq(1.0f, 0.0f), k = 10, nprobe = 2)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("LSH refresh crash between shingles and bands: the replay fail-louds") {
    val path = "/root/repo/target/tmp/crash_lsh"
    Store.deleteRecursive(path)
    graft.dedup.LshIndex.build(docs.filter(col("id") <= 3).select("id", "text"), path)
    val batch = docs.filter(col("id") > 3).select("id", "text")
    crashAt("lsh.refresh.afterPresence")
    try {
      val e = intercept[RuntimeException] {
        graft.dedup.LshIndex.refresh(spark, path, batch)
      }
      assert(e.getMessage.contains("injected crash"))
    } finally FaultPoints.install(null)
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.LshIndex.refresh(spark, path, batch)
    }
    assert(e2.getMessage.contains("ALREADY indexed"))
    // manifest-resolved readers still see the pre-crash banding
    val live = graft.sources.IndexManifest.resolve(spark, path)("shingles")
      .select("id").as[Long].collect().toSet
    assert(live == Set(1L, 2L, 3L))
  }

  test("applyCdc fail-louds on a changed doc that tokenizes to zero terms") {
    val path = "/root/repo/target/tmp/crash_tokenless"
    Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    // an empty-text update would never get a doclens row: N would count a
    // doc the index can never retire — raise instead (both for an update
    // of a present id and an add of a new one)
    for (id <- Seq(2L, 77L)) {
      val e = intercept[IllegalArgumentException] {
        BM25Index.upsertRefresh(spark, path, Seq((id, "")).toDF("id", "text"))
      }
      assert(e.getMessage.contains("ZERO terms"))
    }
    // the failed calls never moved the index
    assert(Store.load(spark, s"$path/scalars").head().getLong(0) == 5L)
  }

  private def gatewayFixture(tag: String): (String, String, String) = {
    val bm25Path = s"/root/repo/target/tmp/crash_gw_${tag}_bm25"
    val ivfPath = s"/root/repo/target/tmp/crash_gw_${tag}_ivf"
    val lshPath = s"/root/repo/target/tmp/crash_gw_${tag}_lsh"
    Seq(bm25Path, ivfPath, lshPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    graft.dedup.LshIndex.build(seed.select("id", "text"), lshPath)
    (bm25Path, ivfPath, lshPath)
  }

  private lazy val gwIncoming = Seq(
    (10L, "replayed duplicate text", v(1, 0)), // clone of doc 1 ⇒ skipped
    (11L, "fresh plan shuffle", v(0.6, 0.8)) // novel ⇒ added
  ).toDF("id", "text", "embedding")

  test("gateway crash before the IVF refresh: the replay re-gates identically and completes every index") {
    val (bm25Path, ivfPath, lshPath) = gatewayFixture("order")
    // the gate's probe source (IVF) refreshes LAST, so a crash after the
    // BM25+LSH refreshes leaves the probe source pre-add: the replayed
    // gate recomputes the IDENTICAL report and the IVF refresh lands with
    // the original novel slice (the r13-ADVICE under-apply window: with
    // IVF refreshed before LSH, the replayed gate saw the post-add store,
    // matched every row against itself, and sealed LSH with ZERO rows)
    crashAt("gateway.beforeIvf")
    try {
      val e = intercept[RuntimeException] {
        graft.ops.IngestGateway.ingestBatch(spark, gwIncoming,
          bm25Path, ivfPath, Some(lshPath), batchId = Some(0L))
      }
      assert(e.getMessage.contains("injected crash"))
    } finally FaultPoints.install(null)
    // mid-crash state: BM25 + LSH carry the novel row (stamped), IVF not yet
    assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 3L)
    assert(Store.load(spark, s"$ivfPath/assignments").count() == 2L)
    // the foreachBatch re-delivery: same batch id
    val replay = graft.ops.IngestGateway.ingestBatch(spark, gwIncoming,
        bm25Path, ivfPath, Some(lshPath), batchId = Some(0L))
      .select("id", "action").as[(Long, String)].collect().toMap
    assert(replay == Map(10L -> "skipped_duplicate", 11L -> "added"),
      s"replayed gate must equal the original decisions: $replay")
    // every index now carries exactly the original novel slice
    assert(Store.load(spark, s"$ivfPath/assignments")
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 11L))
    assert(Store.load(spark, s"$lshPath/shingles")
      .select("id").distinct().as[Long].collect().toSet == Set(1L, 2L, 11L))
    assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 3L)
  }

  test("persisted gate report: every replay serves the ORIGINAL decisions, even after full success") {
    val (bm25Path, ivfPath, lshPath) = gatewayFixture("report")
    val reportPath = "/root/repo/target/tmp/crash_gw_report_log"
    Store.deleteRecursive(reportPath)
    def run() = graft.ops.IngestGateway.ingestBatch(spark, gwIncoming,
        bm25Path, ivfPath, Some(lshPath), batchId = Some(0L),
        reportPath = Some(reportPath))
      .select("id", "action", "top_sim", "top_match_id", "n_links")
      .as[(Long, String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    val original = run()
    assert(original.map(r => r._1 -> r._2) ==
      Seq(10L -> "skipped_duplicate", 11L -> "added"))
    // post-success replay: WITHOUT the persisted report a recomputed gate
    // would read the post-add store and call id 11 a duplicate of itself —
    // the stamped report serves the original decisions byte-equal instead
    assert(run() == original, "replayed report diverged from the original")
    // and the index state never double-applied
    assert(Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 3L)
    assert(Store.load(spark, s"$ivfPath/assignments").count() == 3L)
  }

  test("CDC reduction fail-louds on duplicate (id, seq) at the winning offset") {
    val bm25Path = "/root/repo/target/tmp/crash_tie_bm25"
    val ivfPath = "/root/repo/target/tmp/crash_tie_ivf"
    Seq(bm25Path, ivfPath).foreach(Store.deleteRecursive)
    val seed = Seq((1L, "dup merge window", v(1, 0))).toDF("id", "text", "embedding")
    BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"), ivfPath)
    // two updates of id 1 share the max seq: no deterministic winner — a
    // replay could land a different index state, so the reduction raises
    val tied = Seq(
      (1L, "version a", v(1, 0), "update", 5L),
      (1L, "version b", v(0, 1), "update", 5L)
    ).toDF("id", "text", "embedding", "op", "seq")
    val e = intercept[Exception] {
      EventStream.applyCdcBatch(tied, bm25Path, ivfPath)
    }
    assert(messages(e).exists(_.contains("duplicate (id, seq)")), messages(e))
    // ties BELOW the winner stay legal: the reduction never reads them
    val belowTie = Seq(
      (1L, "old a", v(1, 0), "update", 4L),
      (1L, "old b", v(0, 1), "update", 4L),
      (1L, "merge plan spark", v(0, 1), "update", 5L)
    ).toDF("id", "text", "embedding", "op", "seq")
    EventStream.applyCdcBatch(belowTie, bm25Path, ivfPath)
    graft.search.BM25.clearCache()
    assert(scoreMap(BM25Index.scores(spark, bm25Path, Seq("merge", "plan"))) ==
      scoreMap(BM25.scores(Seq((1L, "merge plan spark")).toDF("id", "text"),
        Seq("merge", "plan"))))
    graft.search.BM25.clearCache()
  }
}
