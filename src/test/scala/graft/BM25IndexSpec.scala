package graft

import org.apache.spark.sql.functions._
import graft.search.{BM25, BM25Index}

/** Pins the persisted BM25 index to the from-scratch scorer: building over
  * the whole corpus, and building over half then refreshing with the rest,
  * must both reproduce BM25.scores exactly (idf epsilon rule, avgdl over
  * all docs, token-less docs excluded from doclens but counted in n). */
class BM25IndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "dup merge window spark"),
    (2L, "spark window agg join"),
    (3L, "dup dup shuffle merge"),
    (4L, "broadcast join plan"),
    (5L, "window spark spark dup"),
    (6L, "")
  ).toDF("id", "text")

  private val query = Seq("dup", "spark", "window", "dup")

  private def scoreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("id", "bm25").as[(Long, Double)].collect().toMap

  test("persisted index reproduces BM25.scores exactly") {
    val path = "/root/repo/target/tmp/bm25idx_full"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25.scores(docs, query)))
  }

  test("build-half then incremental refresh equals build-all") {
    val path = "/root/repo/target/tmp/bm25idx_incr"
    graft.sources.Store.deleteRecursive(path)
    // the token-less doc 6 rides the BUILD half: build counts it into n
    // (rank_bm25 semantics over the full frame); refresh REJECTS token-less
    // adds — they could never be incrementally retired (guard pinned below)
    BM25Index.build(docs.filter(col("id") <= 3 || col("id") === 6), path)
    BM25Index.refresh(spark, path, docs.filter(col("id").isin(4L, 5L)))
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25.scores(docs, query)))
    // n must count token-less docs too (id=6 has no tokens)
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 6L)
  }

  test("refresh fail-louds on a token-less added doc (N would inflate forever)") {
    val path = "/root/repo/target/tmp/bm25idx_tokenless_add"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs.filter(col("id") <= 5), path)
    // same discipline as applyCdc's changed-side guard: a token-less add
    // never gets a doclens row, so counting it into N leaves N inflated
    // with nothing to retire — and the gated-ingest path routes raw
    // crawl-feed docs through refresh, so the guard must live HERE too
    val e = intercept[IllegalArgumentException] {
      BM25Index.refresh(spark, path,
        Seq((7L, "fresh plan salt"), (8L, "")).toDF("id", "text"))
    }
    assert(e.getMessage.contains("ZERO terms"))
    // the failed call never moved the index; a clean batch still lands
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 5L)
    BM25Index.refresh(spark, path, Seq((7L, "fresh plan salt")).toDF("id", "text"))
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 6L)
  }

  test("deleteRefresh ≡ rebuild over the survivors (n, avgdl, idf all shift)") {
    val path = "/root/repo/target/tmp/bm25idx_del"
    val rebuilt = "/root/repo/target/tmp/bm25idx_del_reb"
    graft.sources.Store.deleteRecursive(path)
    graft.sources.Store.deleteRecursive(rebuilt)
    BM25Index.build(docs, path)
    BM25Index.deleteRefresh(spark, path, Seq(2L, 5L).toDF("id"))
    BM25Index.build(docs.filter(!col("id").isin(2L, 5L)), rebuilt)
    assert(scoreMap(BM25Index.scores(spark, path, query)) ==
      scoreMap(BM25Index.scores(spark, rebuilt, query)))
    // n counts the survivors incl. the token-less doc 6 (never indexed,
    // never deleted): 6 - 2
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 4L)
  }

  test("deleteRefresh fail-louds on ids the index cannot retire") {
    val path = "/root/repo/target/tmp/bm25idx_delbad"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    // id 6 is token-less (absent from doclens), id 99 unknown — both
    // would leave N silently stale, so both must raise
    for (bad <- Seq(6L, 99L)) {
      val e = intercept[IllegalArgumentException] {
        BM25Index.deleteRefresh(spark, path, Seq(bad).toDF("id"))
      }
      assert(e.getMessage.contains("rebuild instead"))
    }
  }

  test("upsertRefresh replaces changed docs' postings and admits new docs") {
    val path = "/root/repo/target/tmp/bm25idx_ups"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    // doc 1 re-crawled with entirely new text; doc 7 is brand new
    val batch = Seq((1L, "espresso shuffle shuffle"),
      (7L, "espresso merge plan")).toDF("id", "text")
    BM25Index.upsertRefresh(spark, path, batch)
    val equivalent = Seq(
      (1L, "espresso shuffle shuffle"),
      (2L, "spark window agg join"),
      (3L, "dup dup shuffle merge"),
      (4L, "broadcast join plan"),
      (5L, "window spark spark dup"),
      (6L, ""),
      (7L, "espresso merge plan")
    ).toDF("id", "text")
    // probe with terms spanning doc 1's OLD text (a stale posting would
    // resurface it), its new text, and the new doc
    val probe = Seq("dup", "spark", "window", "shuffle", "espresso", "merge")
    BM25.clearCache()
    assert(scoreMap(BM25Index.scores(spark, path, probe)) ==
      scoreMap(BM25.scores(equivalent, probe)))
    // n: 6 docs, 1 updated in place, 1 new
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 7L)
    BM25.clearCache()
  }

  test("maintenance succeeds with stored postings physically corrupted — it never reads them") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = "/root/repo/target/tmp/bm25idx_corrupt"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    // corrupt every postings file OUTSIDE the probe terms' buckets: the
    // probe stays answerable (bucket pruning), while any maintenance read
    // of those files would explode on the garbage bytes
    val probe = Seq("dup", "spark", "window")
    val probePbs = BM25Index.bucketsForTerms(probe).toSet
    val walked = Files.walk(Paths.get(path, "postings", "data"))
    val corrupted = try walked.iterator().asScala.toVector
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !probePbs.exists(b => p.toString.contains(s"pb=$b/")))
      .map { p => Files.write(p, "NOT A PARQUET FILE".getBytes); p }
    finally walked.close()
    assert(corrupted.nonEmpty, "fixture must have postings outside the probe buckets")
    // every maintenance path still runs against the corrupted store
    BM25Index.deleteRefresh(spark, path, Seq(2L).toDF("id"))
    BM25Index.upsertRefresh(spark, path,
      Seq((3L, "dup dup shuffle salt")).toDF("id", "text"))
    BM25Index.refresh(spark, path, Seq((7L, "fresh plan salt")).toDF("id", "text"))
    // and probes over the untouched buckets still score exactly
    val equivalent = Seq(
      (1L, "dup merge window spark"),
      (3L, "dup dup shuffle salt"),
      (4L, "broadcast join plan"),
      (5L, "window spark spark dup"),
      (6L, ""),
      (7L, "fresh plan salt")).toDF("id", "text")
    BM25.clearCache()
    assert(scoreMap(BM25Index.scores(spark, path, probe)) ==
      scoreMap(BM25.scores(equivalent, probe)))
    BM25.clearCache()
  }

  test("scoresBatch per qid equals N independent scores calls") {
    val path = "/root/repo/target/tmp/bm25idx_batch"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    val qs = Seq(0 -> Seq("dup", "spark", "dup"), 1 -> Seq("window", "join"),
      2 -> Seq("nosuchterm"))
    val batch = BM25Index.scoresBatch(spark, path, qs)
      .select("qid", "id", "bm25").as[(Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    qs.foreach { case (qid, toks) =>
      assert(batch.getOrElse(qid, Map.empty) ==
        scoreMap(BM25Index.scores(spark, path, toks)),
        s"qid $qid diverged from the single-query scorer")
    }
  }

  test("bounded avg-idf skip: an in-bound off-cadence batch keeps the stored epsilon base, n/vocab stay exact") {
    val path = "/root/repo/target/tmp/bm25idx_avgidf"
    val rebuilt = "/root/repo/target/tmp/bm25idx_avgidf_reb"
    Seq(path, rebuilt).foreach(graft.sources.Store.deleteRecursive)
    def text(i: Int) =
      ("common" +: (0 until 9).map(j => s"u${i}x$j")).mkString(" ")
    // 250 docs × (1 shared + 9 unique) terms → vocab 2251: one touched
    // term is 1000·1 < 2251 — inside the 0.1% drift bound
    val corpus = (0 until 250).map(i => (i.toLong, text(i))).toDF("id", "text")
    BM25Index.build(corpus, path)
    def scalars(p: String) = graft.sources.Store.load(spark, s"$p/scalars").head()
    val sc0 = scalars(path)
    assert(sc0.getLong(3) == 2251L, s"vocab: ${sc0.getLong(3)}")
    // off-cadence CDC update ADDING one new term to doc 0: Δn=0,
    // touched=1 → the O(vocab) agg is SKIPPED, the stored epsilon base
    // rides; n, total_tokens and vocab stay exact
    BM25Index.upsertRefresh(spark, path,
      Seq((0L, text(0) + " extra0")).toDF("id", "text"),
      recomputeAvgIdf = false)
    val sc1 = scalars(path)
    assert(sc1.getDouble(2) == sc0.getDouble(2), "epsilon base must ride unchanged")
    assert(sc1.getLong(0) == 250L && sc1.getLong(3) == 2252L)
    // the on-cadence call recomputes exactly: equals a fresh build over
    // the fully-updated corpus (and has genuinely moved off the stale base)
    BM25Index.upsertRefresh(spark, path,
      Seq((1L, text(1) + " extra1")).toDF("id", "text"),
      recomputeAvgIdf = true)
    val sc2 = scalars(path)
    val modified = (0 until 250).map { i =>
      val t = if (i == 0) text(0) + " extra0"
      else if (i == 1) text(1) + " extra1" else text(i)
      (i.toLong, t)
    }.toDF("id", "text")
    BM25Index.build(modified, rebuilt)
    val scReb = scalars(rebuilt)
    assert(math.abs(sc2.getDouble(2) - scReb.getDouble(2)) < 1e-12,
      s"on-cadence recompute must equal rebuild: ${sc2.getDouble(2)} vs ${scReb.getDouble(2)}")
    assert(math.abs(sc2.getDouble(2) - sc0.getDouble(2)) > 1e-8,
      "the recomputed base must actually move (the vocabulary changed)")
    assert(sc2.getLong(3) == 2253L && scReb.getLong(3) == 2253L)
    // an out-of-bound batch recomputes even when flagged skippable:
    // deleting a doc shifts n by 1/250 = 0.4% > the 0.1% bound
    BM25Index.deleteRefresh(spark, path, Seq(2L).toDF("id"),
      recomputeAvgIdf = false)
    val sc3 = scalars(path)
    assert(sc3.getLong(0) == 249L)
    assert(math.abs(sc3.getDouble(2) - sc2.getDouble(2)) > 1e-8,
      "an out-of-bound delete must recompute the base (n shifted 0.4%)")
  }

  test("cumulative avg-idf drift gates on the last-recompute snapshot, not the previous batch") {
    val path = "/root/repo/target/tmp/bm25idx_avgidf_cum"
    graft.sources.Store.deleteRecursive(path)
    def text(i: Int) =
      ("common" +: (0 until 9).map(j => s"u${i}x$j")).mkString(" ")
    // vocab 2251 ⇒ the 0.1% bound allows 2 cumulative touched terms; a
    // per-batch gate would skip 1-term batches FOREVER (each is 1000 <
    // 2251), compounding to ~auditEvery × 0.1% staleness — the snapshot
    // fields force a recompute once the ACCUMULATED drift crosses
    val corpus = (0 until 250).map(i => (i.toLong, text(i))).toDF("id", "text")
    BM25Index.build(corpus, path)
    def scalars() = graft.sources.Store.load(spark, s"$path/scalars").head()
    val sc0 = scalars()
    assert((sc0.getLong(4), sc0.getLong(5), sc0.getLong(6)) == ((250L, 2251L, 0L)),
      "build must seed the recompute snapshot")
    // three consecutive off-cadence 1-new-term batches: skip, skip, recompute
    for (i <- 0 until 3)
      BM25Index.upsertRefresh(spark, path,
        Seq((i.toLong, text(i) + s" extra$i")).toDF("id", "text"),
        recomputeAvgIdf = false)
    val sc = scalars()
    // batch 1: acc 0+1 → skip; batch 2: acc 1+1=2, 2000 < 2251 → skip;
    // batch 3: acc 2+1=3, 3000 ≥ 2251 → recompute despite the flag
    assert(math.abs(sc.getDouble(2) - sc0.getDouble(2)) > 1e-8,
      "the third in-per-batch-bound batch must trip the cumulative gate")
    assert((sc.getLong(4), sc.getLong(5), sc.getLong(6)) == ((250L, 2254L, 0L)),
      s"the recompute must re-seed the snapshot: ${(sc.getLong(4), sc.getLong(5), sc.getLong(6))}")
    assert(sc.getLong(0) == 250L && sc.getLong(3) == 2254L,
      "n and vocab stay exact throughout")
  }

  test("refresh fail-louds on already-indexed ids, duplicate batch ids, and null ids") {
    val path = "/root/repo/target/tmp/bm25idx_guard"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    // an add of an existing id would double-append postings: raise
    val e1 = intercept[IllegalArgumentException] {
      BM25Index.refresh(spark, path, Seq((1L, "replayed text")).toDF("id", "text"))
    }
    assert(e1.getMessage.contains("ALREADY indexed"))
    // two versions of one doc in a single batch: raise
    val e2 = intercept[IllegalArgumentException] {
      BM25Index.refresh(spark, path,
        Seq((7L, "v one"), (7L, "v two")).toDF("id", "text"))
    }
    assert(e2.getMessage.contains("duplicate ids"))
    // a non-numeric id fails loud at the ANSI cast; a NULL id (which the
    // cast passes through) trips the raise_error guard — either way it can
    // never hash as null and silently merge documents
    val e3 = intercept[Exception] {
      BM25Index.refresh(spark, path,
        Seq(("notanumber", "some text")).toDF("id", "text"))
    }
    assert(e3.getMessage.contains("CAST_INVALID_INPUT") ||
      e3.getMessage.contains("null or non-numeric id"))
    val e4 = intercept[Exception] {
      BM25Index.refresh(spark, path,
        Seq(Tuple2(null.asInstanceOf[java.lang.Long], "some text"))
          .toDF("id", "text"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e4).exists(_.contains("null or non-numeric id")), messages(e4))
    // none of the failed calls may have moved the index
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 6L)
  }

  test("applyCdc lands a mixed update+delete batch in ONE generation per table ≡ rebuild") {
    val path = "/root/repo/target/tmp/bm25idx_cdc"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    val genBefore = graft.sources.Store.currentManifest(s"$path/postings").get._1
    BM25Index.applyCdc(spark, path,
      changed = Seq((1L, "espresso shuffle shuffle"),
        (7L, "espresso merge plan")).toDF("id", "text"),
      deletedIds = Seq(5L).toDF("id"))
    // exactly one new postings generation for the whole mixed batch
    assert(graft.sources.Store.currentManifest(s"$path/postings").get._1 == genBefore + 1)
    val equivalent = Seq(
      (1L, "espresso shuffle shuffle"),
      (2L, "spark window agg join"),
      (3L, "dup dup shuffle merge"),
      (4L, "broadcast join plan"),
      (6L, ""),
      (7L, "espresso merge plan")).toDF("id", "text")
    val probe = Seq("dup", "spark", "window", "shuffle", "espresso", "merge")
    BM25.clearCache()
    assert(scoreMap(BM25Index.scores(spark, path, probe)) ==
      scoreMap(BM25.scores(equivalent, probe)))
    assert(graft.sources.Store.load(spark, s"$path/scalars").head().getLong(0) == 6L)
    BM25.clearCache()
  }

  test("compactBuckets rewrites ONLY the named buckets; scores and untouched files unchanged") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = "/root/repo/target/tmp/bm25idx_compact"
    graft.sources.Store.deleteRecursive(path)
    BM25Index.build(docs, path)
    BM25Index.deleteRefresh(spark, path, Seq(2L).toDF("id"))
    BM25.clearCache()
    val pre = scoreMap(BM25Index.scores(spark, path, query))
    def postingFiles() = {
      val w = Files.walk(Paths.get(path, "postings", "data"))
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
      finally w.close()
    }
    val before = postingFiles()
    // the worklist: doc 2's terms (the invalidation plan's bm25_term keys)
    // and its id bucket — driver-side Murmur3, no job
    val pbs = BM25Index.bucketsForTerms(Seq("spark", "window", "agg", "join"))
    BM25Index.compactBuckets(spark, path, pbs, BM25Index.bucketsForIds(Seq(2L)))
    val after = postingFiles()
    // immutability: no pre-existing file was rewritten or dropped
    assert(before.subsetOf(after), s"missing: ${before -- after}")
    // targeting: every NEW postings DATA file sits in a named bucket's dir
    // (the paired tombstone dir holds only partition keys, no pb= layout)
    val added = (after -- before).filter(_.matches(".*/data/b\\d+/.*"))
    assert(added.nonEmpty)
    assert(added.forall(f => pbs.exists(b => f.contains(s"pb=$b/"))),
      s"compaction wrote outside the named buckets: ${added.filterNot(f => pbs.exists(b => f.contains(s"pb=$b/")))}")
    // and the rewrite is semantically invisible
    assert(scoreMap(BM25Index.scores(spark, path, query)) == pre)
    BM25.clearCache()
  }

  // the espresso corpus wearing the engine's memory schema; embeddings
  // from the deterministic hashing provider (no token overlap between
  // "espresso" and doc 9, so the vector branch can't find it). The
  // mismatch doc takes a HIGH id: zero-sim vector ties break by id, so
  // without PRF it sits deep in the tail — any lift is PRF's alone
  private def espressoMem: org.apache.spark.sql.DataFrame = {
    val corpus = (Seq(
      (1L, "espresso espresso crema"),
      (2L, "espresso crema portafilter"),
      (9L, "crema portafilter tamp")) ++
      (3L to 8L).map(i => (i, s"filler$i other$i noise$i")) ++
      (10L to 15L).map(i => (i, s"filler$i other$i noise$i")))
      .toDF("id", "text")
    graft.embed.HashingEmbedder(64).embed(corpus)
      .select(col("id"), col("text"), concat(lit("s/"), col("id")).as("source"),
        lit("detail").as("category"), lit(false).as("archived"),
        lit(false).as("pinned"),
        lit(null).cast("timestamp").as("document_at"),
        lit(null).cast("timestamp").as("created_at"),
        lit(null).cast("timestamp").as("updated_at"),
        lit(null).cast("timestamp").as("last_reinforced_at"),
        col("embedding"))
      .localCheckpoint(true)
  }

  private def espressoQvec: Seq[Float] = spark.range(1)
    .select(graft.embed.HashingEmbedder(64).embeddingColumn(lit("espresso")).as("e"))
    .head().getSeq[Float](0)

  test("hybrid search with the sparse-query trigger recovers via PRF; rich queries untouched") {
    import graft.search.HybridSearch
    val mem = espressoMem
    val qvec = espressoQvec
    val p = HybridSearch.Params(queryTokens = Seq("espresso"), queryVec = qvec,
      k = 15, vectorWeight = 0.3, prf = true)
    BM25.clearCache()
    def ranking(p: HybridSearch.Params) =
      HybridSearch.search(mem, None, p).select("id").as[Long].collect().toSeq
    val withPrf = ranking(p)
    val without = ranking(p.copy(prf = false))
    // with PRF doc 9 rides the (dominant) BM25 branch through its
    // expansion terms → top-3 next to the genuine espresso docs; without,
    // its only support is the 0.3-weighted zero-sim vector tie rank
    assert(withPrf.indexOf(9L) < 3,
      s"sparse trigger + PRF must lift the vocabulary-mismatch doc: $withPrf")
    assert(withPrf.indexOf(9L) < without.indexOf(9L),
      s"PRF must strictly improve doc 9's rank: $withPrf vs $without")
    // gating: a rich query (4 distinct terms > prfMaxQueryTerms) must be
    // byte-identical with prf on or off — expansion never fires
    val rich = p.copy(queryTokens = Seq("espresso", "crema", "portafilter", "tamp"))
    assert(ranking(rich) == ranking(rich.copy(prf = false)))
    BM25.clearCache()
  }

  test("index-backed hybrid sparse-PRF trigger == in-session trigger, prf on/off and rich gate") {
    import graft.search.HybridSearch
    // IVF probes BOTH of its two cells, so the vector candidate pools
    // coincide and any divergence is the indexed BM25/PRF branch's alone
    val bm25Path = "/root/repo/target/tmp/bm25idx_prf_hyb"
    val ivfPath = "/root/repo/target/tmp/ivf_prf_hyb"
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
    val mem = espressoMem
    val qvec = espressoQvec
    graft.search.BM25Index.build(mem, bm25Path)
    graft.ann.IvfIndex.buildWithCentroids(mem,
      Seq((0, qvec), (1, qvec.map(-_))).toDF("label", "centroid"), ivfPath)
    val p = HybridSearch.Params(queryTokens = Seq("espresso"), queryVec = qvec,
      k = 15, vectorWeight = 0.3, prf = true)
    def both(p: HybridSearch.Params) = {
      BM25.clearCache()
      val inSession = HybridSearch.search(mem, None, p)
        .select("id").as[Long].collect().toSeq
      val indexed = HybridSearch.searchIndexed(spark, bm25Path, ivfPath,
          mem, None, p, nprobe = 2)
        .select("id").as[Long].collect().toSeq
      BM25.clearCache()
      (inSession, indexed)
    }
    for (q <- Seq(p, p.copy(prf = false),
        p.copy(queryTokens = Seq("espresso", "crema", "portafilter", "tamp")))) {
      val (inSession, indexed) = both(q)
      assert(indexed == inSession,
        s"indexed hybrid diverged (prf=${q.prf}, |q|=${q.queryTokens.size}): " +
          s"$indexed vs $inSession")
    }
  }

  test("index-backed PRF == in-session PRF through the full maintenance lifecycle") {
    // the tvecs sidecar's contract: RM3 from the stored index must equal
    // the in-session pipeline over the equivalent corpus at EVERY point of
    // the lifecycle — after build, after a delete (the feedback-doc set
    // and idf both shift), and after an upsert (a re-crawled doc's term
    // vector must be the fresh one, not the stale rows a lazy sidecar
    // would serve)
    val path = "/root/repo/target/tmp/bm25idx_prf"
    graft.sources.Store.deleteRecursive(path)
    val corpus = (Seq(
      (1L, "espresso espresso crema"),
      (2L, "espresso crema portafilter"),
      (3L, "crema portafilter tamp")) ++
      (4L to 15L).map(i => (i, s"filler$i other$i noise$i")))
      .toDF("id", "text")
    def prfOf(c: org.apache.spark.sql.DataFrame) = {
      BM25.clearCache()
      val r = BM25.prfExpanded(c, Seq("espresso"), k = 5)
        .as[(Long, Double, Double, Double)].collect().toSeq
      BM25.clearCache(); r
    }
    def prfIdx() = graft.search.BM25Index.prfExpanded(spark, path, Seq("espresso"), k = 5)
      .as[(Long, Double, Double, Double)].collect().toSeq
    graft.search.BM25Index.build(corpus, path)
    assert(prfIdx() == prfOf(corpus), "post-build")
    assert(prfIdx().exists(_._1 == 3L), "fixture must exercise real recovery")
    graft.search.BM25Index.deleteRefresh(spark, path, Seq(2L).toDF("id"))
    assert(prfIdx() == prfOf(corpus.filter(col("id") =!= 2)), "post-delete")
    val recrawled = Seq((1L, "espresso espresso portafilter")).toDF("id", "text")
    graft.search.BM25Index.upsertRefresh(spark, path, recrawled)
    val cur = corpus.filter(col("id") =!= 2).filter(col("id") =!= 1)
      .unionByName(recrawled)
    assert(prfIdx() == prfOf(cur), "post-upsert: stale term vectors served")
  }

  test("PRF expansion recovers a vocabulary-mismatch doc; saturated vocab does no harm") {
    // feedback docs 1-2 match "espresso" and carry crema/portafilter;
    // doc 3 shares those but NOT the query term — only expansion finds it.
    // Docs 4-15 are distinct-vocab filler so crema/portafilter keep
    // positive idf (df=3 of n=15)
    val corpus = (Seq(
      (1L, "espresso espresso crema"),
      (2L, "espresso crema portafilter"),
      (3L, "crema portafilter tamp")) ++
      (4L to 15L).map(i => (i, s"filler$i other$i noise$i")))
      .toDF("id", "text")
    BM25.clearCache()
    val base = BM25.scores(corpus, Seq("espresso"))
      .as[(Long, Double)].collect().toMap
    assert(!base.contains(3L), "doc 3 shares no query term")
    val prf = BM25.prfExpanded(corpus, Seq("espresso"), k = 5)
      .as[(Long, Double, Double, Double)].collect()
    val byId = prf.map(r => r._1 -> r).toMap
    assert(byId.contains(3L), s"expansion should recover doc 3: ${prf.toSeq}")
    assert(byId(3L)._2 == 0.0 && byId(3L)._3 > 0.0,
      "doc 3 scores through the expansion terms alone")
    // expansion must not demote the docs that matched the original query
    assert(byId(1L)._4 >= byId(1L)._2 && byId(2L)._4 >= byId(2L)._2)
    // saturated vocabulary -> no positive-weight candidates -> base ranking
    val flat = (1L to 6L).map(i => (i, "alpha beta gamma")).toDF("id", "text")
    BM25.clearCache()
    val flatPrf = BM25.prfExpanded(flat, Seq("alpha"), k = 6)
      .as[(Long, Double, Double, Double)].collect()
    assert(flatPrf.forall(r => r._3 == 0.0 && r._4 == r._2),
      s"saturated vocab must degrade to the base ranking: ${flatPrf.toSeq}")
    BM25.clearCache()
  }
}
