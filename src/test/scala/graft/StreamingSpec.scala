package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream

/** Structured Streaming pipeline driven through a MemoryStream source —
  * the same transforms the batch oracles validate, executed incrementally
  * with watermarks/state. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed event counts aggregate incrementally with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.windowedEventCounts(events, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0, ""),
        (2L, ts("2024-01-01 10:45:00"), 1L, "view", 2.0, ""),
        (3L, ts("2024-01-01 11:05:00"), 2L, "click", 5.0, ""))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), "view", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "click", 1L, 5.0)))
    } finally q.stop()
  }

  test("running feedback nets accumulate state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val fb = input.toDF().toDF("id", "memory_id", "signal", "ts")
    val q = EventStream.runningFeedbackNets(fb)
      .writeStream.outputMode("update").format("memory")
      .queryName("fb_nets").start()
    try {
      input.addData((1L, 42L, "useful", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      input.addData(
        (2L, 42L, "not_useful", ts("2024-01-01 00:01:00")),
        (3L, 42L, "useful", ts("2024-01-01 00:02:00")),
        (4L, 7L, "not_useful", ts("2024-01-01 00:03:00")))
      q.processAllAvailable()
      // memory 42: +1 then (-1 +1) -> net 1 over 3 events; memory 7: -1
      val all = spark.table("fb_nets").as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.last }
      assert(all(42L) == ((42L, 1L, 3L)))
      assert(all(7L) == ((7L, -1L, 1L)))
    } finally q.stop()
  }

  test("ingest-quality monitor aggregates incrementally == batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("good long text with many useful and unique words here", "en", "2024-01-01 03:00:00"),
      ("1234 5678 9012", "en", "2024-01-01 09:00:00"),
      ("another fine document of reasonable length and variety", "de", "2024-01-02 01:00:00"),
      ("2222 3333", "fr", "2024-01-02 04:00:00"))
      .map { case (t, l, ts) => (t, l, Timestamp.valueOf(ts)) }
    val input = MemoryStream[(String, String, Timestamp)]
    val stream = input.toDF().toDF("text", "lang", "created_at")
    val q = EventStream.qualityWindowStats(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("qw_stats").start()
    try {
      val (a, b) = rows.splitAt(2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("qw_stats")
        .orderBy("window_start").collect().map(_.toString).toSeq
      val batch = EventStream.qualityWindowStats(
          rows.toDF("text", "lang", "created_at"))
        .orderBy("window_start").collect().map(_.toString).toSeq
      assert(streamed == batch && batch.size == 2)
    } finally q.stop()
  }

  test("stream-maintained feedback nets drive HybridSearch identically to the raw log") {
    // the r6_feedback_stream composition, driven through a REAL stream:
    // feedback arrives in two micro-batches, runningFeedbackNets maintains
    // the net table in a memory sink, and search fed from that table must
    // equal search fed the raw log (stream-fed == batch-aggregated)
    implicit val sqlCtx = spark.sqlContext
    import graft.core.Corpus
    import graft.search.HybridSearch
    val fbRows = Corpus.searchFeedback(spark, sf())
      .select("id", "memory_id", "signal", "ts")
      .as[(Long, Long, String, Timestamp)].collect().toSeq
    assert(fbRows.nonEmpty)
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val fb = input.toDF().toDF("id", "memory_id", "signal", "ts")
    val q = EventStream.runningFeedbackNets(fb)
      .writeStream.outputMode("update").format("memory")
      .queryName("fb_nets_search").start()
    try {
      val (a, b) = fbRows.splitAt(fbRows.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    // latest state per memory = the row with the highest event count
    val nets = spark.table("fb_nets_search")
      .groupBy("memoryId")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct("nEvents", "net")).as("s"))
      .selectExpr("memoryId", "s.net AS net")
    val p = Queries.hybridParams(spark, sf())
    val mem = Corpus.memories(spark, sf())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().toSeq
    assert(rows(HybridSearch.search(mem, Some(nets), p)) ==
      rows(HybridSearch.search(mem, Some(Corpus.searchFeedback(spark, sf())), p)))
  }

  test("foreachBatch index refresh: two streamed micro-batches ≡ one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    val bm25Path = "/root/repo/target/tmp/stix_bm25"
    val ivfPath = "/root/repo/target/tmp/stix_ivf"
    val ckpt = "/root/repo/target/tmp/stix_ckpt"
    Seq(bm25Path, ivfPath, ckpt).foreach(graft.sources.Store.deleteRecursive)
    // hand corpus: 2 seed docs indexed at build, 4 more arrive as TWO
    // micro-batches; embeddings are 2-d unit vectors in two clusters
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val all = Seq(
      (1L, "dup merge window", v(1, 0)), (2L, "spark window agg", v(0, 1)),
      (3L, "dup dup shuffle", v(0.8, 0.6)), (4L, "broadcast join plan", v(0.6, 0.8)),
      (5L, "window spark dup", v(1, 0)), (6L, "merge plan spark", v(0, 1)))
    val seed = all.take(2).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    // centroids: the two axis clusters, stored once at build (classic IVF)
    val centroids = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("label", "centroid")
    graft.ann.IvfIndex.buildWithCentroids(seed, centroids, ivfPath)
    val input = MemoryStream[(Long, String, Array[Float])]
    val docs = input.toDF().toDF("id", "text", "embedding")
    val q = EventStream.startIndexRefresh(docs, Some(bm25Path), Some(ivfPath), ckpt)
    try {
      input.addData(all.slice(2, 4)); q.processAllAvailable()
      input.addData(all.slice(4, 6)); q.processAllAvailable()
    } finally q.stop()
    // lexical: streamed-up index ≡ from-scratch scorer over all 6 docs
    val probe = Seq("dup", "spark", "window", "merge")
    graft.search.BM25.clearCache()
    val streamed = graft.search.BM25Index.scores(spark, bm25Path, probe)
      .as[(Long, Double)].collect().toMap
    val scratch = graft.search.BM25.scores(
      all.toDF("id", "text", "embedding").select("id", "text"), probe)
      .as[(Long, Double)].collect().toMap
    assert(streamed == scratch)
    graft.search.BM25.clearCache()
    // vector: every doc assigned, assignments match a direct assign of all
    val live = graft.sources.Store.load(spark, s"$ivfPath/assignments")
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    val expect = graft.ann.Ann.assign(
      all.toDF("id", "text", "embedding").select("id", "embedding"),
      graft.sources.Store.load(spark, s"$ivfPath/centroids"))
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(live == expect && live.size == 6)
  }

  test("streamed flood trips the drift audit and the cadence hook auto-retrains the flagged cell") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val ivfPath = "/root/repo/target/tmp/stix_retrain_ivf"
    val ckpt = "/root/repo/target/tmp/stix_retrain_ckpt"
    Seq(ivfPath, ckpt).foreach(graft.sources.Store.deleteRecursive)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = ((1L to 4L).map(i => (i, s"d$i", v(1, 0.01 * i))) ++
      (5L to 8L).map(i => (i, s"d$i", v(0.01 * i, 1))))
      .toDF("id", "text", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    val input = MemoryStream[(Long, String, Array[Float])]
    val docs = input.toDF().toDF("id", "text", "embedding")
    val q = EventStream.startIndexRefresh(docs, bm25Path = None,
      ivfPath = Some(ivfPath), ckpt, auditEvery = 1)
    try {
      input.addData((20L to 29L).map(i => (i, s"f$i", v(0.72, 0.7))))
      q.processAllAvailable()
    } finally q.stop()
    // the flood flagged cell 0 and the cadence hook retrained it IN-STREAM:
    // the re-seeded baseline reads clean from a fresh audit, and the
    // recentred centroid tilted toward the flood (still unit-norm)
    val audit = graft.ann.IvfIndex.driftAudit(spark, ivfPath)
      .select("ivf_cell", "growth", "sim_drop", "retrain")
      .as[(Int, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(audit(0) == ((0, 1.0, 0.0, false)),
      s"flooded cell must read clean post-retrain: ${audit(0)}")
    assert(!audit(1)._4, s"untouched cell must not flag: ${audit(1)}")
    val cents = graft.sources.Store.load(spark, s"$ivfPath/centroids")
      .select("label", "centroid").as[(Int, Seq[Double])].collect().toMap
    assert(cents(0)(1) > 0.3, s"c0 must tilt toward the flood: ${cents(0)}")
    assert(math.abs(cents(1)(0)) < 1e-12 && math.abs(cents(1)(1) - 1.0) < 1e-12)
    assert(graft.sources.Store.load(spark, s"$ivfPath/assignments").count() == 18L)
    // replay-idempotence without a batch stamp: a second cadence firing
    // reads the clean baseline and no-ops
    assert(graft.ann.IvfIndex.retrainIfDrifted(spark, ivfPath).isEmpty)
    assert(graft.sources.Store.load(spark, s"$ivfPath/assignments")
      .filter(col("ivf_cell") === 0).count() == 14L)
  }

  test("CDC stream: add/update/delete micro-batches land exactly on rebuild state") {
    implicit val sqlCtx = spark.sqlContext
    val bm25Path = "/root/repo/target/tmp/cdc_bm25"
    val ivfPath = "/root/repo/target/tmp/cdc_ivf"
    val ckpt = "/root/repo/target/tmp/cdc_ckpt"
    Seq(bm25Path, ivfPath, ckpt).foreach(graft.sources.Store.deleteRecursive)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq(
      (1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    val centroids = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("label", "centroid")
    graft.ann.IvfIndex.buildWithCentroids(seed, centroids, ivfPath)
    val input = MemoryStream[(Long, String, Array[Float], String)]
    val docs = input.toDF().toDF("id", "text", "embedding", "op")
    val q = EventStream.startCdcMaintenance(docs, bm25Path, ivfPath, ckpt)
    try {
      // batch 1: two adds + doc 1 re-crawled (text AND cluster change)
      input.addData(Seq(
        (3L, "dup dup shuffle", v(0.8, 0.6), "add"),
        (4L, "broadcast join plan", v(0.6, 0.8), "add"),
        (1L, "merge plan spark", v(0, 1), "update")))
      q.processAllAvailable()
      // batch 2: doc 2 deleted, one more add
      input.addData(Seq(
        (2L, "", Array.empty[Float], "delete"),
        (5L, "window spark dup", v(1, 0), "add")))
      q.processAllAvailable()
    } finally q.stop()
    val expected = Seq(
      (1L, "merge plan spark", v(0, 1)),
      (3L, "dup dup shuffle", v(0.8, 0.6)),
      (4L, "broadcast join plan", v(0.6, 0.8)),
      (5L, "window spark dup", v(1, 0)))
    val probe = Seq("dup", "spark", "window", "merge")
    graft.search.BM25.clearCache()
    val streamed = graft.search.BM25Index.scores(spark, bm25Path, probe)
      .as[(Long, Double)].collect().toMap
    val scratch = graft.search.BM25.scores(
      expected.toDF("id", "text", "embedding").select("id", "text"), probe)
      .as[(Long, Double)].collect().toMap
    assert(streamed == scratch)
    graft.search.BM25.clearCache()
    val live = graft.sources.Store.load(spark, s"$ivfPath/assignments")
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    val expect = graft.ann.Ann.assign(
      expected.toDF("id", "text", "embedding").select("id", "embedding"),
      graft.sources.Store.load(spark, s"$ivfPath/centroids"))
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(live == expect && live.size == 4,
      s"post-CDC assignments must equal a rebuild: $live vs $expect")
  }

  test("a re-delivered micro-batch is a no-op: the manifest batch stamp makes refresh exactly-once") {
    val bm25Path = "/root/repo/target/tmp/replay_bm25"
    val ivfPath = "/root/repo/target/tmp/replay_ivf"
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    val batch = Seq((3L, "dup dup shuffle", v(0.8, 0.6))).toDF("id", "text", "embedding")
    EventStream.refreshBatch(batch, 0L, Some(bm25Path), Some(ivfPath))
    val n1 = graft.sources.Store.load(spark, s"$bm25Path/scalars").head().getLong(0)
    val a1 = graft.sources.Store.load(spark, s"$ivfPath/assignments").count()
    // crash-replay: foreachBatch re-delivers batch 0 — without the stamp
    // guard this would fail-loud in refresh (id 3 already indexed) or,
    // pre-guard, silently double-append; with it, a clean no-op
    EventStream.refreshBatch(batch, 0L, Some(bm25Path), Some(ivfPath))
    assert(graft.sources.Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == n1)
    assert(graft.sources.Store.load(spark, s"$ivfPath/assignments").count() == a1)
    assert(n1 == 3L && a1 == 3L)
    // a LATER batch still applies
    EventStream.refreshBatch(
      Seq((4L, "broadcast join plan", v(0.6, 0.8))).toDF("id", "text", "embedding"),
      1L, Some(bm25Path), Some(ivfPath))
    assert(graft.sources.Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 4L)
  }

  test("gated ingest stream: duplicates never enter, novel rows land per micro-batch, replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val bm25Path = "/root/repo/target/tmp/gwst_bm25"
    val ivfPath = "/root/repo/target/tmp/gwst_ivf"
    val lshPath = "/root/repo/target/tmp/gwst_lsh"
    val ckpt = "/root/repo/target/tmp/gwst_ckpt"
    Seq(bm25Path, ivfPath, lshPath, ckpt).foreach(graft.sources.Store.deleteRecursive)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    graft.dedup.LshIndex.build(seed.select("id", "text"), lshPath)
    val input = MemoryStream[(Long, String, Array[Float])]
    val docs = input.toDF().toDF("id", "text", "embedding")
    val q = EventStream.startGatedIngest(docs, bm25Path, ivfPath, ckpt,
      Some(lshPath))
    try {
      // batch 0: a re-crawl of doc 1's exact embedding (gated OUT) plus a
      // genuinely novel doc (gated IN)
      input.addData((10L, "replayed duplicate", v(1, 0)),
        (11L, "fresh plan shuffle", v(0.6, 0.8)))
      q.processAllAvailable()
      // batch 1: the live store now CONTAINS 11 — a re-crawl of ITS
      // embedding is gated out against the post-batch-0 index
      input.addData((12L, "near copy of eleven", v(0.6, 0.8)),
        (13L, "broadcast join plan", v(-0.6, 0.8)))
      q.processAllAvailable()
    } finally q.stop()
    val expected = Seq(
      (1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1)),
      (11L, "fresh plan shuffle", v(0.6, 0.8)),
      (13L, "broadcast join plan", v(-0.6, 0.8)))
    graft.search.BM25.clearCache()
    val probe = Seq("dup", "spark", "window", "plan", "fresh", "broadcast")
    val streamed = graft.search.BM25Index.scores(spark, bm25Path, probe)
      .as[(Long, Double)].collect().toMap
    val scratch = graft.search.BM25.scores(
      expected.toDF("id", "text", "embedding").select("id", "text"), probe)
      .as[(Long, Double)].collect().toMap
    graft.search.BM25.clearCache()
    assert(streamed == scratch,
      s"gated stream must land exactly the novel rows: $streamed vs $scratch")
    assert(graft.sources.Store.load(spark, s"$ivfPath/assignments")
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 11L, 13L))
    assert(graft.sources.Store.load(spark, s"$lshPath/shingles")
      .select("id").distinct().as[Long].collect().toSet == Set(1L, 2L, 11L, 13L))
    // a re-delivered micro-batch no-ops every index write
    EventStream.gatedIngestBatch(
      Seq((10L, "replayed duplicate", v(1, 0)),
        (11L, "fresh plan shuffle", v(0.6, 0.8))).toDF("id", "text", "embedding"),
      0L, bm25Path, ivfPath, Some(lshPath))
    assert(graft.sources.Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 4L)
    assert(graft.sources.Store.load(spark, s"$ivfPath/assignments").count() == 4L)
  }

  test("seq-ordered CDC batch reduces to the last event per id: add→delete→add ends live") {
    val bm25Path = "/root/repo/target/tmp/cdcseq_bm25"
    val ivfPath = "/root/repo/target/tmp/cdcseq_ivf"
    val lshPath = "/root/repo/target/tmp/cdcseq_lsh"
    Seq(bm25Path, ivfPath, lshPath).foreach(graft.sources.Store.deleteRecursive)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((1L, "dup merge window", v(1, 0)),
      (2L, "spark window agg", v(0, 1))).toDF("id", "text", "embedding")
    graft.search.BM25Index.build(seed, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      ivfPath)
    graft.dedup.LshIndex.build(seed.select("id", "text"), lshPath)
    // one micro-batch, ordered by seq:
    //  id 10: add → delete → add(final)      — must end LIVE with the final text
    //  id 11: add → delete                    — never-indexed no-op, must end absent
    //  id 1:  two updates                     — last one wins, no fail-stop
    //  id 2:  delete → (nothing)              — a plain ordered delete
    val batch = Seq(
      (10L, "first version text", v(1, 0), "add", 1L),
      (10L, "", Array.empty[Float], "delete", 2L),
      (10L, "window plan final", v(0, 1), "add", 3L),
      (11L, "ephemeral doc", v(1, 0), "add", 1L),
      (11L, "", Array.empty[Float], "delete", 2L),
      (1L, "first recrawl", v(1, 0), "update", 1L),
      (1L, "merge plan spark", v(0, 1), "update", 2L),
      (2L, "", Array.empty[Float], "delete", 1L)
    ).toDF("id", "text", "embedding", "op", "seq")
    EventStream.cdcBatch(batch, 0L, bm25Path, ivfPath, Some(lshPath))
    val expected = Seq(
      (1L, "merge plan spark", v(0, 1)),
      (10L, "window plan final", v(0, 1)))
    val probe = Seq("dup", "spark", "window", "merge", "plan", "final")
    graft.search.BM25.clearCache()
    val streamed = graft.search.BM25Index.scores(spark, bm25Path, probe)
      .as[(Long, Double)].collect().toMap
    val scratch = graft.search.BM25.scores(
      expected.toDF("id", "text", "embedding").select("id", "text"), probe)
      .as[(Long, Double)].collect().toMap
    assert(streamed == scratch,
      s"seq-reduced CDC must land on last-event state: $streamed vs $scratch")
    graft.search.BM25.clearCache()
    val live = graft.sources.Store.load(spark, s"$ivfPath/assignments")
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(live.keySet == Set(1L, 10L), s"live assignments: $live")
    // the LSH shingle index followed the same batch: doc 2 retired, doc 1
    // re-banded, doc 10 live, the ephemeral doc 11 never entered
    val lshLive = graft.sources.Store.load(spark, s"$lshPath/shingles")
      .select("id").as[Long].collect().toSet
    assert(lshLive == Set(1L, 10L), s"live shingle ids: $lshLive")
    // and the whole mixed batch is replay-safe across all three indexes
    EventStream.cdcBatch(batch, 0L, bm25Path, ivfPath, Some(lshPath))
    assert(graft.sources.Store.load(spark, s"$bm25Path/scalars").head().getLong(0) == 2L)
    assert(graft.sources.IndexManifest.lastBatch(lshPath).contains(0L))
  }

  test("the same transform answers identically in batch mode (oracle form)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0, ""),
      (2L, ts("2024-01-01 10:45:00"), 1L, "view", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventStream.windowedEventCounts(events)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows == Set((ts("2024-01-01 10:00:00"), "view", 2L, 3.0)))
  }

  test("sessionize splits on the 30-minute gap and merges within it") {
    val s = spark
    import s.implicits._
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: events at 0, 10, 29 min (one session), then 65 min (29+30=59
    // < 65 -> new session); user 2: 0 and exactly 30 min (gap == cutoff,
    // NOT greater -> one session)
    val events = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(29)), (4L, 1L, ts(65)),
      (5L, 2L, ts(0)), (6L, 2L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val out = EventStream.sessionize(events)
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 29L * 60000000L), // 3 events, 29-min span
      (1L, 2L, 1L, 0L),
      (2L, 1L, 2L, 30L * 60000000L)), out.mkString("; "))
  }

  test("streaming sessionize: gap-close, event-time timeout, and stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val s = spark
    import s.implicits._
    // off epoch zero: an event at exactly the initial watermark (epoch 0)
    // would be dropped as late
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def tm(min: Long) = new Timestamp(base + min * 60000L)
    val allEvents = Seq(
      (1L, 1L, tm(0)), (2L, 1L, tm(10)), (3L, 1L, tm(29)), // u1 session 1
      (4L, 1L, tm(65)),                                    // u1 session 2 (gap 36)
      (5L, 2L, tm(65)),                                    // u2 session 1
      (6L, 3L, tm(500)),                                   // u3 session 1
      (7L, 3L, tm(1000)))                                  // u3 session 2 (open)
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStream.sessionizeStream(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream").start()
    try {
      // batch 1: u1's open session — nothing emits
      input.addData(allEvents.take(3).map(e => (e._1, e._2, e._3)): _*)
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0)
      // batch 2: event 4 closes u1 session 1 IN-HANDLER (gap 36 > 30)
      input.addData((4L, 1L, tm(65)), (5L, 2L, tm(65)))
      q.processAllAvailable()
      assert(spark.table("sess_stream").as[(Long, Long, Long, Long, Long)]
        .collect().toSet == Set((1L, 1L, 3L, base * 1000L, 29L * 60000000L)))
      // batch 3: watermark jumps to 500min -> u1 session 2 and u2 session 1
      // close by TIMEOUT (their last event + 30min < watermark)
      input.addData((6L, 3L, tm(500)))
      q.processAllAvailable()
      // batch 4: u3's first session closes in-handler (gap 500 > 30)
      input.addData((7L, 3L, tm(1000)))
      q.processAllAvailable()
      val got = spark.table("sess_stream")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // stream == batch on every CLOSED session: the batch form over the
      // same events, minus u3's trailing still-open session
      val batch = EventStream.sessionize(
          allEvents.toDF("event_id", "user_id", "ts"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val open = (3L, 2L, 1L, base * 1000L + 1000L * 60000000L, 0L)
      assert(batch.contains(open))
      assert(got == batch - open, s"got=$got batch=$batch")
    } finally q.stop()
  }

  test("sessionize batch mode of the streaming form withholds only open tails") {
    val s = spark
    import s.implicits._
    def tm(min: Long) = new Timestamp(min * 60000L)
    val events = Seq(
      (1L, 1L, tm(0)), (2L, 1L, tm(10)), (3L, 1L, tm(65)), (4L, 2L, tm(0)))
      .toDF("event_id", "user_id", "ts")
    // batch execution of the stateful form: emits each user's closed
    // sessions; trailing open sessions (u1 idx 2, u2 idx 1) stay withheld
    val got = EventStream.sessionizeStream(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 0L, 10L * 60000000L)))
  }

  test("streaming ingest gate drops exact and corpus-near duplicates") {
    import graft.streaming.StreamDedup
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different reference material about spark partitions"))
      .toDF("id", "text")
    val index = StreamDedup.corpusChunkIndex(corpus).localCheckpoint(true)
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.admit(input.toDF().toDF("id", "text"), index)
      .writeStream.outputMode("append").format("memory")
      .queryName("admitted").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"), // corpus dup
        (2L, "an entirely novel document about training data curation"),
        (3L, "an  entirely novel document about training data curation")) // exact dup of 2 (ws)
      q.processAllAvailable()
      input.addData(
        (4L, "an entirely novel document about training data curation"), // cross-batch exact dup
        (5L, "another fresh document with its own vocabulary and shape"))
      q.processAllAvailable()
      val admitted = spark.table("admitted").select("id").as[Long].collect().toSet
      assert(admitted == Set(2L, 5L))
    } finally q.stop()
  }

  test("the ingest gate answers identically on a batch frame") {
    import graft.streaming.StreamDedup
    val corpus = Seq((100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely novel document about training data curation"))
      .toDF("id", "text")
    val out = StreamDedup.admit(batch, StreamDedup.corpusChunkIndex(corpus))
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("CMS and HLL sketches build incrementally over a document stream == batch") {
    import graft.text.Sketches
    implicit val sqlCtx = spark.sqlContext
    // both sketches ARE groupBy aggregations, so the batch operators run
    // unchanged as streaming state: cells/registers update per micro-batch
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val cms = Sketches.cmsTermCounts(docs)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    val hll = Sketches.hllRegisters(docs)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream").start()
    try {
      input.addData(1L -> "alpha beta alpha", 2L -> "beta gamma")
      cms.processAllAvailable(); hll.processAllAvailable()
      input.addData(3L -> "gamma delta alpha epsilon")
      cms.processAllAvailable(); hll.processAllAvailable()
      val batch = Seq(
        (1L, "alpha beta alpha"), (2L, "beta gamma"),
        (3L, "gamma delta alpha epsilon")).toDF("id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(rows(spark.table("cms_stream")) ==
        rows(Sketches.cmsTermCounts(batch)))
      assert(rows(spark.table("hll_stream")) ==
        rows(Sketches.hllRegisters(batch)))
    } finally { cms.stop(); hll.stop() }
  }

  test("term-slice counts stream == batch, and drift rolls up identically from the streamed state") {
    import org.apache.spark.sql.functions.col
    import graft.text.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    // the drift monitor's streamable stage is one conditional-sum groupBy;
    // the JS rollup is a batch pass over the <=|vocab|-row counts table
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("source", "text")
    val counts = TextAnalysis.termSliceCounts(docs, col("source") === "a")
      .writeStream.outputMode("complete").format("memory")
      .queryName("drift_stream").start()
    try {
      input.addData("a" -> "x y x", "b" -> "y z")
      counts.processAllAvailable()
      input.addData("a" -> "z w", "b" -> "w w y")
      counts.processAllAvailable()
      val batch = Seq(("a", "x y x"), ("b", "y z"), ("a", "z w"), ("b", "w w y"))
        .toDF("source", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(rows(spark.table("drift_stream")) ==
        rows(TextAnalysis.termSliceCounts(batch, col("source") === "a")))
      assert(rows(TextAnalysis.termDriftFromCounts(spark.table("drift_stream"))) ==
        rows(TextAnalysis.termDriftFromCounts(
          TextAnalysis.termSliceCounts(batch, col("source") === "a"))))
    } finally counts.stop()
  }

  test("stream-stream interval join: click-view pairs == batch, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    def tm(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // (event_id, user_id, ts); tolerance 30 min for the test
    val tolUs = 30L * 60L * 1000000L
    val clickRows = Seq((100L, 1L, tm(40)), (101L, 2L, tm(50)), (102L, 1L, tm(95)))
    val viewRows = Seq(
      (1L, 1L, tm(15)),  // 25 min before click 100 -> pair
      (2L, 1L, tm(39)),  // 1 min before click 100 AND 56 before 102 (out)
      (3L, 2L, tm(5)),   // 45 min before click 101 -> outside tolerance
      (4L, 2L, tm(50)),  // same instant as click 101 -> inclusive pair
      (5L, 1L, tm(70)))  // 25 min before click 102 -> pair
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts").withWatermark("ts", "10 minutes")
    val joined = EventStream.clickViewPairs(
      shape(cIn.toDF()), shape(vIn.toDF()), tolUs)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("cv_pairs").start()
    try {
      // views arrive across micro-batches, clicks interleaved — inner-join
      // matches emit as both sides arrive, no watermark wait
      vIn.addData(viewRows.take(3): _*)
      cIn.addData(clickRows.take(2): _*)
      q.processAllAvailable()
      vIn.addData(viewRows.drop(3): _*)
      cIn.addData(clickRows.drop(2): _*)
      q.processAllAvailable()
      val streamRows = spark.table("cv_pairs")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = EventStream.clickViewPairs(
        clickRows.toDF("event_id", "user_id", "ts"),
        viewRows.toDF("event_id", "user_id", "ts"), tolUs)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamRows == batch)
      assert(streamRows == Set(
        (1L, 100L, 1L, 25L * 60L * 1000000L),
        (1L, 100L, 2L, 1L * 60L * 1000000L),
        (2L, 101L, 4L, 0L),
        (1L, 102L, 5L, 25L * 60L * 1000000L)))
    } finally q.stop()
  }
}
