package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Corpus
import graft.embed.DeterministicFakeSession
import graft.search.{LateInteraction, VectorSearch}

/** Late-interaction (MaxSim) rerank invariants: the subword token
  * embedding soft-matches morphological variants, and the full distributed
  * rerank reproduces a driver-side re-derivation of the MaxSim fold
  * (pool → distinct doc tokens → per-query-token micro-unit max → sum)
  * computed independently through the raw kernel. */
class LateInteractionSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64

  /** Driver-side mirror of [[LateInteraction.gramText]]. */
  private def gram(tok: String): String =
    if (tok.length >= 3)
      (tok +: (0 to tok.length - 3).map(i => tok.substring(i, i + 3))).mkString(" ")
    else tok

  /** Driver-side token embedding through the raw hashing kernel. */
  private def tokEmbed(tok: String): Array[Float] =
    graft.expressions.TextKernels
      .hashEmbed(UTF8String.fromString(gram(tok)), dim).toFloatArray()

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)

  test("subword token embeddings soft-match morphological variants") {
    val retrieval = tokEmbed("retrieval")
    // shared trigrams (ret, etr, tri, rie, iev) pull the variant close;
    // an unrelated token shares none
    assert(dot(retrieval, tokEmbed("retrieving")) > dot(retrieval, tokEmbed("spark")))
    assert(dot(retrieval, tokEmbed("retrieving")) > 0.3)
  }

  test("the column-expression token embedding IS the kernel over the gram text") {
    val toks = Seq("retrieval", "ab", "x", "window")
    val fromCol = toks.toDF("t")
      .select(LateInteraction.tokenEmbedding(col("t"), dim))
      .as[Array[Float]].collect()
    toks.zip(fromCol).foreach { case (t, e) =>
      assert(e.sameElements(tokEmbed(t)), s"mismatch for '$t'")
    }
  }

  /** Driver-side re-derivation of the MaxSim fold over a collected pool
    * (id, rel, text): the expected (rank, id, rel, maxsim) top-5. */
  private def maxSimFold(pool: Seq[(Long, Double, String)]): Seq[(Int, Long, Double, Double)] = {
    val qEmb = Queries.QueryTokens.distinct.map(tokEmbed)
    pool.map { case (id, rel, text) =>
      val docToks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
      val smicro = qEmb.map { qe =>
        if (docToks.isEmpty) 0L
        else docToks.map(t =>
          BigDecimal(dot(tokEmbed(t), qe) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).max
      }.sum
      (id, rel, smicro)
    }.sortBy { case (id, _, sm) => (-sm, id) }
      .take(5).zipWithIndex
      .map { case ((id, rel, sm), i) =>
        (i + 1, id, rel, BigDecimal(sm / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  test("rerank reproduces a driver-side MaxSim fold over the candidate pool") {
    val mem = Corpus.memories(spark, sf())
    val queryText = Queries.QueryTokens.mkString(" ")
    val qv = DeterministicFakeSession(dim).encode(Seq(queryText)).head.toSeq
    val pool = VectorSearch.topK(mem, qv, k = 20)
      .select(col("id"), col("sim"), col("text"))
      .as[(Long, Double, String)].collect().toSeq
    val got = LateInteraction.rerank(mem, queryText, n = 5, candidates = 20,
      mode = LateInteraction.ModeMaxSim)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == maxSimFold(pool))
  }

  test("hybrid cascade reproduces the fold over the FUSED pool") {
    val mem = Corpus.memories(spark, sf())
    val fb = Some(Corpus.searchFeedback(spark, sf()))
    val p = Queries.hybridParams(spark, sf())
    val queryText = Queries.QueryTokens.mkString(" ")
    val textById = mem.select(col("id"), col("text"))
      .as[(Long, String)].collect().toMap
    val pool = graft.search.HybridSearch.search(mem, fb, p.copy(k = 20))
      .select(col("id"), col("rrf_score"))
      .as[(Long, Double)].collect().toSeq
      .map { case (id, rel) => (id, rel, textById(id)) }
    val got = LateInteraction
      .rerankHybrid(mem, fb, p, queryText, n = 5, candidates = 20,
        mode = LateInteraction.ModeMaxSim)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == maxSimFold(pool))
  }

  test("indexed rerank with an exhaustive probe IS the in-session rerank") {
    // nprobe = cellCount ⇒ the probed pool is the whole index, so the
    // indexed leg must reproduce the corpus-scan leg bit for bit
    val mem = Corpus.memories(spark, sf())
    val queryText = Queries.QueryTokens.mkString(" ")
    val ivfPath = "/root/repo/target/tmp/li_spec_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    graft.ann.IvfIndex.build(mem, graft.core.Tables.embeddings(spark, sf()), ivfPath)
    val nCells = graft.ann.IvfIndex.cellCount(spark, ivfPath)
    val exhaustive = LateInteraction.rerankIndexed(spark, ivfPath, mem,
      queryText, n = 5, candidates = 20, nprobe = nCells,
      mode = LateInteraction.ModeMaxSim)
      .as[(Int, Long, Double, Double)].collect().toSeq
    val inSession = LateInteraction.rerank(mem, queryText, n = 5,
      candidates = 20, mode = LateInteraction.ModeMaxSim)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(exhaustive == inSession)
    graft.sources.Store.deleteRecursive(ivfPath)
  }

  test("blend modes reproduce a driver-side fusion of the two rank lists") {
    // the cascade's blend stage (r14 verdict #2): collect the fused pool
    // and its MaxSim micro-scores, re-derive all three blend orderings
    // driver-side, and demand the distributed modes agree rank for rank
    val mem = Corpus.memories(spark, sf())
    val fb = Some(Corpus.searchFeedback(spark, sf()))
    val p = Queries.hybridParams(spark, sf())
    val queryText = Queries.QueryTokens.mkString(" ")
    val textById = mem.select(col("id"), col("text"))
      .as[(Long, String)].collect().toMap
    val pool = graft.search.HybridSearch.search(mem, fb, p.copy(k = 20))
      .select(col("id"), col("rrf_score"))
      .as[(Long, Double)].collect().toSeq
      .map { case (id, rel) => (id, rel, textById(id)) }
    // (id, rel, smicro) driver-side
    val qEmb = Queries.QueryTokens.distinct.map(tokEmbed)
    val scored = pool.map { case (id, rel, text) =>
      val docToks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
      val sm = qEmb.map { qe =>
        if (docToks.isEmpty) 0L
        else docToks.map(t => BigDecimal(dot(tokEmbed(t), qe) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).max
      }.sum
      (id, rel, sm)
    }
    val pr = scored.sortBy { case (id, rel, _) => (-rel, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> i }.toMap
    val mr = scored.sortBy { case (id, _, sm) => (-sm, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> i }.toMap
    def run(mode: String) = LateInteraction
      .rerankHybrid(mem, fb, p, queryText, n = 5, candidates = 20, mode = mode)
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    def expect(order: ((Long, Double, Long)) => (Double, Long)) =
      scored.sortBy(order).take(5).zipWithIndex
        .map { case ((id, _, _), i) => (i + 1, id) }
    def blend(w: Double, k0: Int)(r: (Long, Double, Long)): (Double, Long) = {
      val b = BigDecimal(2 * w / (k0 + pr(r._1)) + 2 * (1 - w) / (k0 + mr(r._1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (-b, r._1)
    }
    assert(run(LateInteraction.ModeBlendRrf) ==
      expect(blend(0.5, graft.search.HybridSearch.RrfK)))
    assert(run(LateInteraction.ModeBlendWrrf) ==
      expect(blend(LateInteraction.BlendPoolWeight, LateInteraction.BlendRrfK)))
    assert(run(LateInteraction.ModeBlendTie) ==
      scored.sortBy { case (id, rel, sm) => (-rel, -sm, id) }.take(5)
        .zipWithIndex.map { case ((id, _, _), i) => (i + 1, id) },
      "blend_tie must be the (rel desc, maxsim desc, id) order")
    val unknown = intercept[IllegalArgumentException] {
      run("nope")
    }
    assert(unknown.getMessage.contains("unknown mode"))
  }

  test("the no-arg cascade IS the blend_wrrf ordering (r15 verdict #1)") {
    // the production default flipped to the measured winner: a caller
    // taking the API defaults must get the pool-weighted steep-k RRF
    // blend, bit for bit — including the blend column in the schema
    val mem = Corpus.memories(spark, sf())
    val fb = Some(Corpus.searchFeedback(spark, sf()))
    val p = Queries.hybridParams(spark, sf())
    val queryText = Queries.QueryTokens.mkString(" ")
    val noArgHybrid = LateInteraction
      .rerankHybrid(mem, fb, p, queryText, n = 5, candidates = 20)
    assert(noArgHybrid.columns.toSeq ==
      Seq("rank", "id", "rel", "maxsim", "blend"))
    assert(noArgHybrid.collect().toSeq == LateInteraction
      .rerankHybrid(mem, fb, p, queryText, n = 5, candidates = 20,
        mode = LateInteraction.ModeBlendWrrf).collect().toSeq)
    assert(LateInteraction.rerank(mem, queryText, n = 5, candidates = 20)
      .collect().toSeq ==
      LateInteraction.rerank(mem, queryText, n = 5, candidates = 20,
        mode = LateInteraction.ModeBlendWrrf).collect().toSeq)
    // the INDEXED entry point's no-mode-arg default too (r16 verdict #1 —
    // it was the one cascade entry point not pinned): nprobe = cellCount
    // makes the probed pool deterministic (the whole index), so the only
    // degree of freedom left is the mode default under test
    val ivfPath = "/root/repo/target/tmp/li_spec_default_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    graft.ann.IvfIndex.build(mem, graft.core.Tables.embeddings(spark, sf()), ivfPath)
    val nCells = graft.ann.IvfIndex.cellCount(spark, ivfPath)
    assert(LateInteraction.rerankIndexed(spark, ivfPath, mem, queryText,
      n = 5, candidates = 20, nprobe = nCells).collect().toSeq ==
      LateInteraction.rerankIndexed(spark, ivfPath, mem, queryText,
        n = 5, candidates = 20, nprobe = nCells,
        mode = LateInteraction.ModeBlendWrrf).collect().toSeq)
    graft.sources.Store.deleteRecursive(ivfPath)
  }

  test("rerankHybridBatch IS the per-qid union of single-query cascades (r16 verdict #1)") {
    // the batch tail (ONE token explode + qid-partitioned folds) must
    // reproduce N independent rerankHybrid runs row for row — including
    // that qid 1's DISJOINT token set never leaks into qid 0's fold
    val mem = Corpus.memories(spark, sf())
    val fb = Some(Corpus.searchFeedback(spark, sf()))
    val p0 = Queries.hybridParams(spark, sf())
    val p1 = p0.copy(queryVec = Queries.queryVec(spark, sf(), 1))
    val t0 = Queries.QueryTokens.mkString(" ")
    val t1 = Queries.QueryTokens2.mkString(" ")
    val batch = LateInteraction.rerankHybridBatch(mem, fb,
      Seq((p0, t0), (p1, t1)), n = 5, candidates = 20)
    assert(batch.columns.toSeq ==
      Seq("rank", "id", "rel", "maxsim", "blend", "query_idx"))
    val singles = LateInteraction
      .rerankHybrid(mem, fb, p0, t0, n = 5, candidates = 20)
      .withColumn("query_idx", lit(0))
      .unionAll(LateInteraction
        .rerankHybrid(mem, fb, p1, t1, n = 5, candidates = 20)
        .withColumn("query_idx", lit(1)))
    assert(batch.collect().toSeq == singles.collect().toSeq)
  }

  test("rerankIndexedBatch IS the per-qid union of indexed single-query cascades") {
    // the full production batch: shared-plan indexed pool + one-pass tail
    // must equal, row for row, the composition of per-query searchIndexed
    // pools each reranked by the single-query tail
    val mem = Corpus.memories(spark, sf())
    val fb = Some(Corpus.searchFeedback(spark, sf()))
    val p0 = Queries.hybridParams(spark, sf())
    val p1 = p0.copy(queryVec = Queries.queryVec(spark, sf(), 1))
    val t0 = Queries.QueryTokens.mkString(" ")
    val t1 = Queries.QueryTokens2.mkString(" ")
    val bm25Path = "/root/repo/target/tmp/li_batch_bm25"
    val ivfPath = "/root/repo/target/tmp/li_batch_ivf"
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
    graft.search.BM25Index.build(mem, bm25Path)
    graft.ann.IvfIndex.build(mem, graft.core.Tables.embeddings(spark, sf()), ivfPath)
    val batch = LateInteraction.rerankIndexedBatch(spark, bm25Path, ivfPath,
      mem, fb, Seq((p0, t0), (p1, t1)), n = 5, candidates = 20)
    def single(p: graft.search.HybridSearch.Params, t: String, qi: Int) = {
      val pool = graft.search.HybridSearch
        .searchIndexed(spark, bm25Path, ivfPath, mem, fb, p.copy(k = 20))
        .select(col("id"), col("rrf_score").as("rel"))
        .join(mem.select(col("id"), col("text")), Seq("id"))
        .select(col("id"), col("rel"), col("text"))
      LateInteraction.maxSimTail(pool, t, n = 5, dim = dim)
        .withColumn("query_idx", lit(qi))
    }
    assert(batch.collect().toSeq ==
      single(p0, t0, 0).unionAll(single(p1, t1, 1)).collect().toSeq)
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
  }

  test("blend_wrrf protects the pool-rank-0 gold at C = 100") {
    // the analytic bound (C−1)(k₀+1)/((k₀+C−1)+(C−1)(k₀+1)) is monotone in
    // C with supremum (k₀+1)/(k₀+2) = 2/3 < 0.7, so the pool's top-1 must
    // survive even a 100-candidate pool where EVERY other candidate beats
    // it on token evidence (gold text shares no query token → worst-case
    // maxsim rank; the 99 competitors carry the exact query tokens)
    val queryText = Queries.QueryTokens.mkString(" ")
    val pool = (1L to 100L).map(i =>
        (i, 1.0 - i * 0.001, if (i == 1L) "zzzz" else queryText))
      .toDF("id", "rel", "text")
    val got = LateInteraction.maxSimTail(pool, queryText, n = 1, dim = dim,
      mode = LateInteraction.ModeBlendWrrf)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L), "the pool-rank-0 gold must keep rank 1")
  }

  test("a token-less candidate keeps its pool slot with maxsim 0") {
    // two docs: one carries a query token, one is whitespace-only text;
    // both must surface, the empty one with maxsim exactly 0
    val mem = Corpus.memories(spark, sf())
      .filter(!col("archived")).limit(2)
      .withColumn("text",
        when(row_number().over(org.apache.spark.sql.expressions.Window.orderBy("id")) === 1,
          lit("spark window")).otherwise(lit("   ")))
    val out = LateInteraction.rerank(mem, Queries.QueryTokens.mkString(" "),
      n = 2, candidates = 2, mode = LateInteraction.ModeMaxSim)
      .select("rank", "maxsim").as[(Int, Double)].collect().toSeq
    assert(out.size == 2)
    assert(out.map(_._1) == Seq(1, 2))
    assert(out.last._2 == 0.0)
    assert(out.head._2 > 0.0)
  }
}
