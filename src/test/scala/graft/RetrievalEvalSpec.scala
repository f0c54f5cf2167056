package graft

import org.apache.spark.sql.functions._
import graft.eval.RetrievalEval

/** Metric math and protocol semantics for the self-retrieval eval harness,
  * on corpora small enough to rank by hand. */
class RetrievalEvalSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  /** Disjoint-vocabulary corpus: every doc is its own best match in both
    * modes (small enough that no two docs share a 64-dim hash bucket with
    * matching sign — verified by the first test, which would catch a
    * collision as recall < 1). Sampled queries (id % 37 == 0): ids 0, 37. */
  private def disjointCorpus = df(
    0L -> "alpha bravo charlie delta echo foxtrot",
    5L -> "golf hotel india juliet kilo lima",
    37L -> "mike november oscar papa quebec romeo",
    38L -> "sierra tango uniform victor whiskey xray")

  test("perfect corpus scores 1.0 across the board in both modes") {
    val out = RetrievalEval.selfRetrieval(disjointCorpus).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("bm25", "vector"))
    out.foreach { r =>
      assert(r.getLong(1) == 2) // ids 0 and 37
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
        r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0, r.toString)
    }
  }

  test("an identical lower-id duplicate outranks the source: rank 2, MRR 0.75") {
    // doc 5 duplicates query doc 37's text; ties resolve by lower id, so
    // query 37 finds its source at rank 2 in both modes while query 0
    // stays at rank 1 -> recall@1 = 0.5, recall@5 = 1.0, MRR = 0.75
    val corpus = disjointCorpus.withColumn("text",
      when(col("id") === 5L,
        lit("mike november oscar papa quebec romeo"))
        .otherwise(col("text")))
    val out = RetrievalEval.selfRetrieval(corpus).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 2)
      assert(r.getDouble(2) == 0.5, s"recall@1: $r")
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"recall@5/10: $r")
      assert(r.getDouble(5) == 0.75, s"mrr: $r")
    }
  }

  test("seeding end-task eval: trained centroids >= positional on fused recall/MRR (r16 verdict #2)") {
    // the END-TASK closure of the r16 rung-ppm win: the same truncated
    // self-retrieval protocol, run through the production indexed hybrid
    // at the production nprobe, over the REAL fixture corpus (a symmetric
    // synthetic fixture degenerates — the r15 two-blob pitfall: identical
    // centroids collapse assignment into one cell and "recall" is
    // trivially perfect). Spec-gated, not oracled — the standing kmeans
    // adjudication. Measured at HEAD (sf0.001, nlist 8, nprobe 2):
    // trained recall@10 = mrr sees the same-or-better pool every query.
    val docs = Queries.docs(spark, sf())
    val base = "/root/repo/target/tmp/seed_task"
    val (bm25, pos, trn) = (s"${base}_bm25", s"${base}_pos", s"${base}_trn")
    Seq(bm25, pos, trn).foreach(graft.sources.Store.deleteRecursive)
    val out = RetrievalEval
      .seedingTaskEval(spark, docs, bm25, pos, trn)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("positional", "trained"))
    val Array(p, t) = out
    assert(p.getLong(1) == t.getLong(1) && p.getLong(1) > 0,
      "both legs must score the same non-empty query set")
    info(s"positional: recall@10 ${p.getDouble(4)}, mrr ${p.getDouble(5)}")
    info(s"trained:    recall@10 ${t.getDouble(4)}, mrr ${t.getDouble(5)}")
    assert(t.getDouble(4) >= p.getDouble(4),
      s"trained recall@k ${t.getDouble(4)} must be >= positional ${p.getDouble(4)}")
    assert(t.getDouble(5) >= p.getDouble(5),
      s"trained mrr@k ${t.getDouble(5)} must be >= positional ${p.getDouble(5)}")
    Seq(bm25, pos, trn).foreach(graft.sources.Store.deleteRecursive)
  }

  test("query set is deterministic, bounded, and skips token-poor docs") {
    val corpus = disjointCorpus.withColumn("text",
      when(col("id") === 0L, lit("too short")).otherwise(col("text")))
    val qs = RetrievalEval.querySet(corpus).collect()
    assert(qs.map(_.getLong(0)).toSeq == Seq(37L)) // id 0 dropped: < 4 tokens
    // truncation keeps the first half of the tokens
    assert(qs.head.getString(1) == "mike november oscar")
  }

  // ------------------------------------------------------ 2-hop graph lift

  private def liftCorpus = {
    val s = spark
    import s.implicits._
    // hand fixture: the query vector is [1,0,...]. Doc 1 (the anchor)
    // matches it exactly; doc 2 (the linked support) is ORTHOGONAL to the
    // query, so the base ranker puts it dead last; distractors 3-5 score
    // 0.9. With graph off, top-3 = {1,3,4} (ties by id). With graph on,
    // the anchor's entire propagated PPR mass flows down its ONLY edge
    // 1→2 while the edgeless distractors receive nothing beyond their own
    // teleport — so doc 2 is the top boosted/injected candidate and must
    // enter the top-3. No arithmetic needed beyond "sole neighbor of the
    // top seed beats nodes with zero incoming mass".
    def vec(x: Float, y: Float) = Seq(x, y, 0f, 0f)
    Seq(
      (1L, "anchor", vec(1f, 0f), Seq((("related_to", 2L)))),
      (2L, "support", vec(0f, 1f), Seq.empty[(String, Long)]),
      (3L, "noise a", vec(0.9f, 0.1f), Seq.empty[(String, Long)]),
      (4L, "noise b", vec(0.9f, 0.1f), Seq.empty[(String, Long)]),
      (5L, "noise c", vec(0.9f, 0.1f), Seq.empty[(String, Long)]))
      .toDF("id", "text", "embedding", "_l")
      .withColumn("links", transform(col("_l"),
        l => struct(l.getField("_1").as("link_type"), l.getField("_2").as("to_id"))))
      .drop("_l")
      .withColumn("source", concat(lit("src/"), col("id")))
      .withColumn("category", lit("detail"))
      .withColumn("archived", lit(false))
      .withColumn("created_at", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("updated_at", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("document_at", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("last_reinforced_at", lit(null).cast("timestamp"))
  }

  test("maxsim eval: exhaustive-candidates pool mode IS the selfRetrieval vector mode") {
    // with the pool as wide as the corpus, the pool ordering is the global
    // vector ordering — the 'pool' metrics row must equal selfRetrieval's
    // 'vector' row exactly (same ranks, same metric math)
    val corpus = disjointCorpus
    val n = corpus.count().toInt
    val poolRow = RetrievalEval.maxSimSelfRetrieval(corpus, candidates = n)
      .filter(col("mode") === "pool").drop("mode").collect().toSeq
    val vecRow = RetrievalEval.selfRetrieval(corpus)
      .filter(col("mode") === "vector").drop("mode").collect().toSeq
    assert(poolRow == vecRow)
  }

  test("maxsim eval: token evidence recovers a gold the pooled vector misranks") {
    // query (id 0, first half) = "alpha beta gamma delta"; the distractor
    // repeats three of the four query tokens, so its POOLED vector points
    // more along the query than the gold (whose tail tokens dilute it) —
    // but MaxSim sees the distractor has NO token matching "delta" while
    // the gold matches all four, and flips the order back
    val corpus = df(
      0L -> "alpha beta gamma delta nois1 nois2 nois3 nois4",
      1L -> "alpha beta gamma gamma beta alpha")
    val out = RetrievalEval.maxSimSelfRetrieval(corpus).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap // mode -> recall@1
    assert(out("pool") == 0.0, s"fixture must misrank under the pool: $out")
    assert(out("maxsim") == 1.0, s"MaxSim must recover the gold: $out")
  }

  test("maxsim cascade eval: perfect corpus scores 1.0 under both fused orderings") {
    // on the disjoint-vocabulary corpus each doc is its own best match in
    // BOTH legs, so fusion and the MaxSim rerank must both keep it at 1
    val out = RetrievalEval.maxSimCascadeEval(disjointCorpus).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("hybrid_maxsim", "hybrid_pool"))
    out.foreach { r =>
      assert(r.getLong(1) == 2)
      assert(r.getDouble(2) == 1.0 && r.getDouble(5) == 1.0, r.toString)
    }
  }

  test("maxsim cascade eval: the rerank never loses a gold the pool carries") {
    // the vector-pool flip fixture, through the CASCADE: whatever order
    // fusion lands on (the two-doc corpus gives the BM25 leg almost no
    // idf signal), the gold is IN the pool and carries all four query
    // tokens, so the MaxSim pass must rank it first
    val corpus = df(
      0L -> "alpha beta gamma delta nois1 nois2 nois3 nois4",
      1L -> "alpha beta gamma gamma beta alpha")
    val out = RetrievalEval.maxSimCascadeEval(corpus).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("hybrid_maxsim") == 1.0, s"MaxSim must recover the gold: $out")
    assert(out("hybrid_maxsim") >= out("hybrid_pool"), out.toString)
  }

  test("autoNprobe picks the smallest rung clearing the target recall") {
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/eval_autonprobe_ivf"
    graft.sources.Store.deleteRecursive(path)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // the sampled query (id 37, the only id % 37 == 0) sits in cell 0 at
    // (0.8, 0.6): its exact top-10 spans BOTH cells (self 1.0 + five cell-0
    // rows at 0.8 + four cell-1 rows at 0.6), so nprobe=1 probes cell 0
    // only (6 of 10 hits — recall 600000 ppm) while nprobe=2 is exhaustive
    val mem = ((1L to 5L).map(i => (i, v4(1, 0))) ++
      (20L to 40L).map(i => (i, if (i == 37L) v4(0.8, 0.6) else v4(0, 1))))
      .toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), path)
    val sweep = RetrievalEval.ivfRecallSweep(spark, mem, path, nprobes = Seq(1, 2))
      .select("nprobe", "recall_ppm").as[(Long, Long)].collect().toMap
    assert(sweep == Map(1L -> 600000L, 2L -> 1000000L), s"sweep: $sweep")
    // rung 1 fails a 0.9 target, rung 2 clears it; a lax target takes 1;
    // an unreachable target falls back to probing every cell (= exact)
    assert(RetrievalEval.autoNprobe(spark, mem, path, 900000L, ladder = Seq(1, 2)) == 2)
    assert(RetrievalEval.autoNprobe(spark, mem, path, 500000L, ladder = Seq(1, 2)) == 1)
    assert(RetrievalEval.autoNprobe(spark, mem, path, 1000001L, ladder = Seq(1)) == 2,
      "an unreachable target must fall back to the full cell count")
  }

  test("the recall ladder's query sample is bounded by maxQueries (r14 #1)") {
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/eval_qcap_ivf"
    graft.sources.Store.deleteRecursive(path)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // THREE sampled query ids (0, 37, 74 — all % 37 == 0) + filler rows
    val mem = (Seq(0L, 37L, 74L).map(i => (i, v4(1, 0))) ++
      (100L to 110L).map(i => (i, v4(0, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), path)
    def nq(cap: Int) = RetrievalEval.ivfRecallSweep(spark, mem, path,
      nprobes = Seq(2), maxQueries = cap).select("n_queries").head.getLong(0)
    assert(nq(2) == 2L, "a >cap sample must be cut to maxQueries")
    assert(nq(1024) == 3L, "an under-cap sample must be untouched")
  }

  test("a corpus-bounded tuning sweep stays within one rung of the full sweep") {
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/eval_ccap_ivf"
    graft.sources.Store.deleteRecursive(path)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // query id 0 at (0.8, 0.6): exact top-10 spans both cells; nprobe=1
    // probes cell 0 only (6/10) in BOTH the full corpus and the first-10
    // order-stable sample, so the tuned rung must agree
    val mem = (Seq((0L, v4(0.8, 0.6))) ++
      (1L to 5L).map(i => (i, v4(1, 0))) ++
      (20L to 30L).map(i => (i, v4(0, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), path)
    val full = RetrievalEval.autoNprobe(spark, mem, path, 900000L,
      ladder = Seq(1, 2))
    val covering = RetrievalEval.autoNprobe(spark, mem, path, 900000L,
      ladder = Seq(1, 2), maxCorpusRows = Some(1000))
    val sampled = RetrievalEval.autoNprobe(spark, mem, path, 900000L,
      ladder = Seq(1, 2), maxCorpusRows = Some(10))
    assert(full == 2 && covering == full,
      s"a sample covering the corpus must reproduce the full sweep: $covering vs $full")
    assert(math.abs(sampled - full) <= 1, s"sampled=$sampled full=$full")
    assert(sampled == full, s"this fixture's rung survives the sample: $sampled")
  }

  test("the tuning corpus sample is hash-spread, not first-N-by-id (r15 #2)") {
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/eval_spread_ivf"
    graft.sources.Store.deleteRecursive(path)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // ids 1..20 are the "oldest" ingest slice; the five query ids
    // (% 37 == 0) sit at the HIGH end of the id range — the drifted-newest
    // shape the tuning overloads exist for. A first-10-by-id cut samples
    // ZERO queries (the old bias); the hash-spread cut reaches the tail.
    val qids = Seq(37L, 74L, 111L, 148L, 185L)
    val ids = (1L to 20L) ++ qids
    val mem = ids.map(i =>
        (i, if (qids.contains(i)) v4(1, 0) else v4(0, 1)))
      .toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), path)
    // driver-side replay of the LCG spread predicts the engine's sample:
    // all five query ids rank inside the 10-row cut (and would be cut to
    // zero by an id-ordered head — the fixture discriminates)
    def lcg(i: Long) = ((i % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    val predicted = ids.sortBy(i => (lcg(i), i)).take(10)
    assert(predicted.count(_ % 37L == 0L) == 5 &&
      ids.sorted.take(10).count(_ % 37L == 0L) == 0,
      s"fixture must discriminate spread vs head order: $predicted")
    val row = RetrievalEval.ivfRecallSweep(spark, mem, path,
      nprobes = Seq(2), maxCorpusRows = Some(10)).head()
    assert(row.getLong(0) == 5L,
      s"the spread sample must reach all 5 tail-end query ids, got $row")
    assert(row.getLong(row.fieldIndex("recall_ppm")) == 1000000L,
      s"nprobe = cellCount within the sample is exhaustive, got $row")
  }

  test("an empty query sample yields recall 0 and a conservative fallback") {
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/eval_ecap_ivf"
    graft.sources.Store.deleteRecursive(path)
    def v4(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0.0f, 0.0f)
    // no id % 37 == 0 row survives a 5-row order-stable corpus sample
    val mem = ((1L to 5L).map(i => (i, v4(1, 0))) ++
      (20L to 30L).map(i => (i, v4(0, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("label", "centroid"), path)
    val row = RetrievalEval.ivfRecallSweep(spark, mem, path,
      nprobes = Seq(1), maxCorpusRows = Some(5)).head()
    assert(row.getLong(0) == 0L && row.getLong(row.fieldIndex("recall_ppm")) == 0L,
      s"empty sample must report recall 0, got $row")
    // recall 0 clears no target -> fall back to probing every cell (exact)
    assert(RetrievalEval.autoNprobe(spark, mem, path, 900000L,
      ladder = Seq(1), maxCorpusRows = Some(5)) == 2)
  }

  test("graph expansion lifts the linked support into the top k") {
    import graft.search.HybridSearch
    val qv = Seq(1f, 0f, 0f, 0f)
    def top3(gw: Double): Seq[Long] =
      HybridSearch.search(liftCorpus, None,
          graft.eval.GraphLiftEval.params(qv, gw).copy(k = 3))
        .select("id").collect().map(_.getLong(0)).toSeq
    val off = top3(0.0)
    val on = top3(0.1)
    assert(off == Seq(1L, 3L, 4L), s"off=$off") // support absent, ties by id
    assert(on.contains(2L), s"on=$on")          // support lifted by the link
    assert(on.head == 1L)                       // anchor still first
  }

  test("the registered graph-lift A/B reports a positive hop-1 lift") {
    val qvs = graft.eval.GraphLiftEval.Anchors
      .map(a => a -> Queries.queryVec(spark, sf(), a)).toMap
    val rows = graft.eval.GraphLiftEval.graphLift(
        graft.core.Corpus.memories(spark, sf()), qvs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    assert(rows(0.1) > rows(0.0),
      s"expected positive hop1 lift, got $rows")
  }
}
