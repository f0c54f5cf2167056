package graft

import org.apache.spark.sql.functions._
import graft.ann.BinaryQuant
import graft.core.Corpus
import graft.search.{GraphSearch, VectorSearch}
import graft.text.TextAnalysis

/** Round-8 tier invariants: binary-quantized retrieval (bit packing is
  * faithful, exhaustive pool = exact search, recall monotone in the
  * candidate budget), CCNet perplexity terciles (total partition, ordered
  * buckets, tercile-sized head), and deterministic LPA communities with a
  * hand-computed two-triangle fixture + modularity value. */
class TiersSpec extends SparkSpec {

  import spark.implicits._

  test("packed-long Hamming equals the semantic per-dim sign disagreement on every row") {
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val (q0, q1) = BinaryQuant.packQuery(qv)
    // semantic form: count dims whose sign side differs from the query's
    val qSigns = typedLit(qv.map(v => v > 0f))
    val sem = aggregate(
      zip_with(col("embedding").cast("array<double>"), qSigns,
        (x, s) => when((x > 0) =!= s, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("int")
    val mismatches = BinaryQuant.encode(mem)
      .select(BinaryQuant.hamming(q0, q1).as("packed"), sem.as("semantic"))
      .filter(col("packed") =!= col("semantic"))
      .count()
    assert(mismatches == 0)
  }

  test("binary top-k with an exhaustive candidate pool IS the exact search") {
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val n = mem.count().toInt
    val bq = BinaryQuant.topKBinary(mem, qv, k = 10, candidates = n)
      .select("id", "sim").as[(Long, Double)].collect().toSeq
    val exact = VectorSearch.topK(mem, qv, k = 10)
      .select("id", "sim").as[(Long, Double)].collect().toSeq
    assert(bq == exact)
  }

  test("binary recall@10 is monotone in the candidate budget") {
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val exactTop = VectorSearch.topK(mem, qv, k = 10)
      .select("id").as[Long].collect().toSet
    def recall(candidates: Int): Int =
      BinaryQuant.topKBinary(mem, qv, k = 10, candidates = candidates)
        .select("id").as[Long].collect().count(exactTop.contains)
    // a wider Hamming pool is a superset (prefix of the same ordering), and
    // any true-top-10 member in the pool survives the exact re-rank — so
    // recall can only grow with the budget
    assert(recall(200) >= recall(50))
  }

  test("tier sweep: pool recall equals served recall for the binary arm") {
    // the exact re-rank preserves every true-top-10 member of the pool
    // (at most 9 pool rows out-score such a member), so the sweep's
    // pool-recall must equal ann_bq_recall's served recall exactly
    val sweep = Queries.all("ann_tier_sweep")(spark, sf())
      .filter(col("tier") === "bq")
      .select("recall_at_10").as[Double].collect().head
    val served = Queries.all("ann_bq_recall")(spark, sf())
      .select("recall_at_10").as[Double].collect().head
    assert(sweep == served)
  }

  test("perplexity buckets: total partition, ordered tiers, tercile-sized head") {
    val docs = Queries.docs(spark, sf())
    val out = TextAnalysis.perplexityBuckets(docs)
      .select("id", "nll", "bucket").as[(Long, Double, String)].collect().toSeq
    val n = out.length
    assert(n == TextAnalysis.unigramNll(docs).count())
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // tiers are ordered on the centi-grid: every head bin <= every middle
    // bin <= every tail bin (strict between tiers — a shared bin would have
    // landed both docs in the better bucket)
    def bins(b: String) = byBucket(b).map(v => math.round(v * 10000))
    assert(bins("head").max < bins("middle").min)
    assert(bins("middle").max < bins("tail").min)
    // nearest-rank head: at least ceil(n/3) docs, over only by bin ties
    assert(bins("head").size >= (n + 2) / 3)
  }

  test("local clustering: hand values on the two-triangle bridge fixture") {
    val lcc = GraphSearch.localClustering(twoTriangles)
      .select("id", "deg", "n_tri", "lcc")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // nodes 1,2,5,6: deg 2, 1 triangle -> lcc 1.0
    // nodes 3,4: deg 3 (triangle + bridge), 1 triangle -> 2/(3*2) = 0.333333
    assert(lcc(1L) == ((2L, 1L, 1.0)) && lcc(2L) == ((2L, 1L, 1.0)))
    assert(lcc(5L) == ((2L, 1L, 1.0)) && lcc(6L) == ((2L, 1L, 1.0)))
    assert(lcc(3L) == ((3L, 1L, 0.333333)) && lcc(4L) == ((3L, 1L, 0.333333)))
  }

  test("local clustering sums to 3x the global triangle census") {
    val pairs = graft.dedup.Dedup
      .findDuplicates(Corpus.memories(spark, sf()), threshold = 0.35)
      .select("id_a", "id_b").localCheckpoint(true)
    val perNode = GraphSearch.localClustering(pairs)
      .agg(sum("n_tri")).as[Long].collect().head
    val global = GraphSearch.triangleCensus(pairs)
      .select("n_triangles").as[Long].collect().head
    assert(perNode == 3 * global)
  }

  test("batched IVF equals the single-query path for every query vector") {
    val emb = graft.core.Tables.embeddings(spark, sf())
    val cent = graft.ann.Ann.centroidsByLabel(emb)
    val assigned = graft.ann.Ann
      .assign(Corpus.memories(spark, sf()), cent).localCheckpoint(true)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = graft.ann.Ann.ivfBatchTopK(assigned, cent, qs, k = 10, nprobe = 2)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    for (v <- 0L until 3L) {
      val single = graft.ann.Ann.ivfTopK(assigned, cent,
          Queries.queryVec(spark, sf(), vecId = v), k = 10, nprobe = 2)
        .select("id", "sim").as[(Long, Double)].collect().toSeq
      assert(batch(v) == single, s"vec $v diverged")
    }
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    val before = Seq((1L, "a", "s", false), (2L, "b", "s", false),
      (3L, "c", "s", false)).toDF("id", "text", "source", "archived")
    val after = Seq((1L, "a", "s", false), (2L, "B", "s", false),
      (4L, "d", "s", false)).toDF("id", "text", "source", "archived")
    val got = graft.sources.Store.diff(before, after)
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("MMR rerank: top-1 = relevance top-1, pool-bounded, scores non-increasing") {
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val out = graft.search.Mmr.rerank(mem, qv, n = 5, candidates = 20)
      .orderBy("rank").as[(Int, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1 to 5))
    val pool = VectorSearch.topK(mem, qv, k = 20).select("id")
      .as[Long].collect().toSet
    assert(out.map(_._2).toSet.subsetOf(pool) && out.map(_._2).distinct.size == 5)
    // the first pick IS the relevance argmax, scored without penalty
    val top1 = VectorSearch.topK(mem, qv, k = 1)
      .select("id", "sim").as[(Long, Double)].collect().head
    assert(out.head._2 == top1._1)
    assert(out.head._4 ==
      BigDecimal(0.7 * top1._2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // each round maximizes over a shrinking set with growing penalties, so
    // the greedy score sequence cannot increase
    assert(out.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  test("salted join is row-identical to the plain equi-join") {
    val probe = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 5L),
      (4L, "en", 7L), (5L, "fr", 3L)).toDF("id", "lang", "v")
    val build = Seq(("en", 100L), ("de", 200L), ("fr", 300L))
      .toDF("lang", "total")
    val plain = probe.join(build, "lang")
      .select("id", "lang", "v", "total")
      .as[(Long, String, Long, Long)].collect().toSeq.sorted
    for (salts <- Seq(1, 3, 8)) {
      val salted = graft.joins.Joins
        .saltedJoin(probe, build, Seq("lang"), salts, xxhash64(col("id")))
        .select("id", "lang", "v", "total")
        .as[(Long, String, Long, Long)].collect().toSeq.sorted
      assert(salted == plain, s"salts=$salts diverged")
    }
  }

  test("FIM transform: three non-empty parts that reassemble the document") {
    val docs = Queries.docs(spark, sf())
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val expected = docs.select(col("id"), concat_ws(" ", toks).as("full"))
      .filter(size(toks) >= 3).as[(Long, String)].collect().toMap
    val out = graft.text.Packing.fimTransform(docs)
      .select("id", "prefix", "middle", "suffix", "fim")
      .as[(Long, String, String, String, String)].collect()
    assert(out.length == expected.size)
    out.foreach { case (id, p, m, sfx, fim) =>
      assert(p.nonEmpty && m.nonEmpty && sfx.nonEmpty)
      // PSM re-orders but loses nothing: P+M+S re-joins to the original
      assert(s"$p $m $sfx" == expected(id))
      assert(fim == s"<fim_prefix>$p<fim_suffix>$sfx<fim_middle>$m")
    }
  }

  test("chunk windows: full coverage, W-bounded, stride-overlapping") {
    val (w, s) = (64, 48)
    val docs = Queries.docs(spark, sf())
    val nTok = docs
      .select(col("id"), size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).as[(Long, Long)].collect().toMap
    val chunks = graft.text.Packing.chunkWindows(docs, w, s)
      .select("id", "chunk_id", "n_tok_chunk")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(chunks.keySet == nTok.keySet)
    chunks.foreach { case (id, cs) =>
      val n = nTok(id)
      val sorted = cs.sortBy(_._2)
      // ids dense from 0; every chunk at most W tokens; all full-W except
      // possibly the last; the last window reaches the document end
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      assert(sorted.forall(_._3 <= w))
      assert(sorted.init.forall(_._3 == w))
      val lastStart = (sorted.size - 1).toLong * s
      assert(lastStart + sorted.last._3 == n)
      // and the PREVIOUS window already ended past this one's start
      // (overlap w - s) whenever there are at least two windows
      if (sorted.size > 1) assert(lastStart < (sorted.size - 2).toLong * s + w)
    }
  }

  test("alternating-stars CC: chain and island collapse to min-id components") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val got = graft.dedup.Clusters.connectedComponentsStars(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("alternating-stars CC equals the min-label/union-find labels on the fixture graph") {
    val pairs = graft.dedup.Dedup
      .findDuplicates(Corpus.memories(spark, sf()), threshold = 0.35)
      .select("id_a", "id_b").localCheckpoint(true)
    val stars = graft.dedup.Clusters.connectedComponentsStars(pairs)
      .as[(Long, Long)].collect().toMap
    val auto = graft.dedup.Clusters.connectedComponentsAuto(pairs)
      .as[(Long, Long)].collect().toMap
    assert(stars == auto)
  }

  test("alternating-stars CC fails loudly when the round budget is too small") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException] {
      graft.dedup.Clusters.connectedComponentsStars(chain, maxRounds = 1).collect()
    }
  }

  // two triangles joined by a bridge: deterministic synchronous LPA with
  // (count desc, label asc) tie-breaks converges by round 4 to one label
  // per triangle (hand-traced: [2,1,1,3,4,4] -> [1,1,1,4,3,3] ->
  // [1,1,1,3,3,3] -> stable)
  private def twoTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    .toDF("id_a", "id_b")

  test("LPA on the two-triangle fixture: one community per triangle") {
    val labels = GraphSearch.labelPropagation(twoTriangles, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("modularity of the two-triangle partition is the hand value 70/196") {
    val pairs = twoTriangles
    val labels = GraphSearch.labelPropagation(pairs, rounds = 4)
    val row = GraphSearch.modularity(pairs, labels)
      .as[(Long, Long, Double)].collect().head
    // M = 7 edges; each triangle: e_c = 3, d_c = 7
    // Q = (4*7*6 - (49 + 49)) / (4*49) = 70/196 = 0.357143 (6dp)
    assert(row == ((2L, 7L, 0.357143)))
  }

  test("fixture LPA finds real structure: labels are vertex ids, communities merge, Q > 0") {
    val pairs = graft.dedup.Dedup
      .findDuplicates(Corpus.memories(spark, sf()), threshold = 0.35)
      .select("id_a", "id_b").localCheckpoint(true)
    val labels = GraphSearch.labelPropagation(pairs, rounds = QueriesTiers.LpaRounds)
    val rows = labels.as[(Long, Long)].collect().toSeq
    val vertices = rows.map(_._1).toSet
    // every community label is itself a vertex (labels only ever copy ids)
    assert(rows.map(_._2).toSet.subsetOf(vertices))
    // propagation actually merged: fewer communities than vertices
    assert(rows.map(_._2).distinct.size < vertices.size)
    // and the partition beats the null model on the similarity graph
    val q = GraphSearch.modularity(pairs, labels)
      .select("modularity").as[Double].collect().head
    assert(q > 0.0)
  }
}
