package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq}
import graft.core.{Corpus, Tables}
import graft.search.GraphSearch
import graft.text.Curation

/** Round-7 operator invariants: PQ/IVF-PQ coding, the triangle census,
  * boilerplate line removal, and weighted sampling. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("PQ encode emits one in-range code per subspace and is deterministic") {
    val emb = Tables.embeddings(spark, sf())
    val books = Pq.codebooks(emb)
    val labels = books.select("label").distinct().as[Int].collect().toSet
    val mem = Corpus.memories(spark, sf())
    val enc = Pq.encode(mem, books).select("id", "pq_codes")
    val rows = enc.as[(Long, Seq[Int])].collect()
    assert(rows.nonEmpty)
    val m = 64 / Pq.SubDim
    rows.foreach { case (_, codes) =>
      assert(codes.length == m)
      codes.foreach(c => assert(labels.contains(c)))
    }
    // partition-invariant: a repartitioned input yields identical codes
    val enc2 = Pq.encode(mem.repartition(7), books).select("id", "pq_codes")
      .as[(Long, Seq[Int])].collect().toMap
    rows.foreach { case (id, codes) => assert(enc2(id) == codes) }
  }

  test("map-only literal-fold encoding equals the broadcast-join formulation") {
    val emb = Tables.embeddings(spark, sf())
    val books = Pq.codebooks(emb)
    val mem = Corpus.memories(spark, sf())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("pq_codes").cast("string"))
        .orderBy("id").collect().toSeq
    assert(rows(Pq.encode(mem, books)) == rows(Pq.encodeJoin(mem, books)))
  }

  test("ADC lookup-table scoring equals the decode-and-dot reconstruction") {
    val emb = Tables.embeddings(spark, sf())
    val books = Pq.codebooks(emb)
    val qv = Queries.queryVec(spark, sf())
    val mem = Corpus.memories(spark, sf())
    val enc = Pq.encode(mem, books)
    val viaLut = Pq.adcScores(enc, books, qv)
      .as[(Long, Double)].collect().toMap
    // reconstruction: join codes back to codebooks, sum the per-subspace
    // rounded micro-dots — the semantic pin for the literal-map fold
    val lut = Pq.adcTable(books, qv)
    val viaJoin = enc.select(col("id"), posexplode(col("pq_codes")))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.map { case (_, sub, code) =>
          lut(sub * Ann.MaxNlist + code) }.sum.toDouble / Pq.Micro
      }
    viaJoin.foreach { case (id, s) =>
      assert(math.abs(viaLut(id) - s) < 1e-9, s"id=$id lut=${viaLut(id)} join=$s")
    }
  }

  test("IVF-PQ hits come from probed cells and carry exact similarities") {
    val emb = Tables.embeddings(spark, sf())
    val cent = Ann.centroidsByLabel(emb)
    val books = Pq.residualCodebooks(emb, cent)
    val qv = Queries.queryVec(spark, sf())
    val mem = Corpus.memories(spark, sf())
    val assigned = Ann.assign(mem, cent)
    val hits = Pq.ivfPqTopK(assigned, cent, books, qv, k = 10)
      .select("id", "ivf_cell", "sim")
      .as[(Long, Int, Double)].collect()
    assert(hits.nonEmpty)
    assert(hits.map(_._2).distinct.length <= 2) // nprobe = 2
    val exact = graft.search.VectorSearch
      .topK(mem, qv, 100000, includeArchived = true)
      .select("id", "sim").as[(Long, Double)].collect().toMap
    hits.foreach { case (id, _, s) => assert(exact(id) == s) }
  }

  test("persisted IVF-PQ equals the in-memory composition and prunes the embedding column off the ADC scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = "/root/repo/target/tmp/ivfpq_index_spec"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    graft.ann.IvfPqIndex.build(mem, emb, path)
    val fromIndex = graft.ann.IvfPqIndex.topK(spark, path, qv, k = 10)
    val cent = Ann.centroidsByLabel(emb)
    val inMemory = Pq.ivfPqTopK(Ann.assign(mem, cent), cent,
      Pq.residualCodebooks(emb, cent), qv, k = 10)
    assert(fromIndex.collect().toSeq == inMemory.collect().toSeq)
    // the ADC ranking stage must read codes, not vectors: its scan's
    // ReadSchema carries pq_codes and NOT embedding (AQE off so the
    // physical tree is walkable, as in AnnSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val books = graft.sources.Store.load(spark, s"$path/codebooks")
      val cents = graft.sources.Store.load(spark, s"$path/centroids")
      val probedCodes = graft.sources.Store.load(spark, s"$path/assignments")
        .filter(org.apache.spark.sql.functions.col("ivf_cell").isin(0, 1))
        .select("id", "ivf_cell", "pq_codes")
      val adc = Pq.adcScoresResidual(probedCodes, books, cents, qv)
      adc.collect()
      val scans = adc.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      val schemas = scans.map(_.metadata("ReadSchema"))
      assert(schemas.exists(_.contains("pq_codes")), schemas.mkString("; "))
      assert(!schemas.exists(_.contains("embedding")), schemas.mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("IVF-PQ refresh against stored centroids and codebooks reproduces the full rebuild") {
    val pathA = "/root/repo/target/tmp/ivfpq_index_full"
    val pathB = "/root/repo/target/tmp/ivfpq_index_inc"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    val half = Corpus.nDocs(spark, sf()) / 2
    graft.ann.IvfPqIndex.build(mem, emb, pathA)
    graft.ann.IvfPqIndex.build(mem.filter(col("id") < half), emb, pathB)
    graft.ann.IvfPqIndex.refresh(spark, pathB, mem.filter(col("id") >= half))
    def rows(p: String) = graft.sources.Store.load(spark, s"$p/assignments")
      .select(col("id"), col("ivf_cell"), col("pq_codes").cast("string"))
      .orderBy("id").collect().toSeq
    assert(rows(pathA) == rows(pathB))
  }

  test("driver-side ADC LUT is bit-identical to the Column formulation") {
    // the serving path computes the LUT on the driver (one codebook
    // collect shared with encoding); same left-to-right fold + HALF_UP
    // rounding as the Spark-side adcTable — pinned here
    val emb = Tables.embeddings(spark, sf())
    val cent = Ann.centroidsByLabel(emb)
    val qv = Queries.queryVec(spark, sf())
    val books = Pq.residualCodebooks(emb, cent)
    val viaRows = Pq.lutFromRows(Pq.collectBooks(books), qv, Pq.SubDim)
    val viaColumn = Pq.adcTable(books, qv)
    assert(viaRows == viaColumn)
  }

  test("residual ADC recall at a fixed code budget is at least raw-codebook ADC recall") {
    // The Faiss IVFPQ claim (Jégou '11 §IV.A): quantizing x − centroid[cell]
    // spends the same byte budget on within-cell variation instead of
    // re-describing the cell, so ADC ranks candidates at least as well.
    // Measured over ALL cells (codebook quality, independent of nprobe) at
    // the tight budget (= k) AND the serving budget (= the default
    // candidates = 50) so the codes, not the re-rank, decide. Measured on
    // the fixture: raw = 0.2/0.5, residual = 0.3/0.8.
    val emb = Tables.embeddings(spark, sf())
    val cent = Ann.centroidsByLabel(emb)
    val qv = Queries.queryVec(spark, sf())
    val mem = Corpus.memories(spark, sf())
    val assigned = Ann.assign(mem, cent).localCheckpoint(true)
    val exact = graft.search.VectorSearch
      .topK(mem, qv, 10, includeArchived = true)
      .select("id").as[Long].collect().toSet
    val rawBooks = Pq.codebooks(emb)
    val raw = Pq.adcScores(Pq.encode(assigned, rawBooks), rawBooks, qv)
      .orderBy(desc("adc"), asc("id")).limit(50)
      .select("id").as[Long].collect()
    val resBooks = Pq.residualCodebooks(emb, cent)
    val res = Pq.adcScoresResidual(
        Pq.encodeResidual(assigned, resBooks, cent)
          .select("id", "ivf_cell", "pq_codes"),
        resBooks, cent, qv)
      .orderBy(desc("adc"), asc("id")).limit(50)
      .select("id").as[Long].collect()
    def recall(top: Seq[Long], budget: Int): Double =
      top.take(budget).count(exact).toDouble / 10.0
    for (budget <- Seq(10, 50))
      assert(recall(res, budget) >= recall(raw, budget),
        s"budget=$budget residual=${recall(res, budget)} raw=${recall(raw, budget)}")
    assert(recall(res, 50) >= 0.7,
      s"residual recall at the serving budget ${recall(res, 50)} degenerate")
  }

  test("energy-sorted OPQ permutation: a true permutation, and recall at fixed budget >= raw PQ") {
    // sf0.01, not the sf0.001 default: at ~60 rows recall@10 of a single
    // query moves by whole ±0.1 steps on one id and the comparison is
    // noise; sf0.01 is where the driver gate measures it (0.2 -> 0.4)
    val dir = sf("sf0.01")
    val emb = Tables.embeddings(spark, dir)
    val mem = Corpus.memories(spark, dir)
    val qv = Queries.queryVec(spark, dir)
    val perm = Pq.energyPermutation(emb)
    assert(perm.sorted == (0 until 64), "not a permutation of 0..63")
    // rotation preserves dot products (orthonormal), so the exact top-k
    // ground truth is computed once from the raw vectors
    val exact = graft.search.VectorSearch.topK(mem, qv, 10)
      .select("id").as[Long].collect().toSet
    def top10(m: org.apache.spark.sql.DataFrame,
              e: org.apache.spark.sql.DataFrame, q: Seq[Float]): Seq[Long] = {
      val books = Pq.codebooks(e)
      Pq.pqTopK(Pq.encode(m, books), books, q, k = 10)
        .select("id").as[Long].collect().toSeq
    }
    val rot = Pq.rotate(col("embedding"), perm)
    val raw = top10(mem, emb, qv)
    val opq = top10(mem.withColumn("embedding", rot),
      emb.withColumn("embedding", rot), perm.map(qv))
    def recall(ids: Seq[Long]) = ids.count(exact).toDouble / 10.0
    // measured 0.2 -> 0.4 on the fixture; >= pins non-regression
    assert(recall(opq) >= recall(raw),
      s"opq=${recall(opq)} < raw=${recall(raw)}")
  }

  test("duplicate-trigram char fraction covers planted repetition and zeroes clean docs") {
    // "a b c" repeated 3x: the trigram "a b c" occurs with count >= 2;
    // cov = 3 * 5 chars = 15 over 17 chars of text
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "all tokens unique here now")
    ).toDF("id", "text")
    val out = graft.text.TextAnalysis.dupNgramCharFrac(docs, n = 3)
      .orderBy("id").as[(Long, Double)].collect()
    assert(out(0)._2 == math.rint(15.0 / 17.0 * 1e6) / 1e6)
    assert(out(1)._2 == 0.0)
  }

  test("triangle census counts a hand-built graph correctly") {
    // K3 on {1,2,3} plus pendant edge 3-4: 1 triangle; degrees 2,2,3,1 →
    // wedges = 1+1+3+0 = 5; transitivity = 3/5
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val r = GraphSearch.triangleCensus(pairs).collect().head
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 4)
    assert(r.getAs[Long]("n_wedges") == 5)
    assert(r.getAs[Long]("n_triangles") == 1)
    assert(r.getAs[Double]("transitivity") == 0.6)
    // duplicate/reversed/self pairs collapse to the same census
    val noisy = pairs.unionAll(Seq((2L, 1L), (3L, 3L), (1L, 2L))
      .toDF("id_a", "id_b"))
    assert(GraphSearch.triangleCensus(noisy).collect().head == r)
  }

  test("hard negatives exclude the gold doc and rank by descending similarity") {
    val rows = Queries.all("ev_hard_negatives")(spark, sf())
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, neg, _) => assert(neg != qid) }
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.length))
      assert(sorted.map(_._4) == sorted.map(_._4).sorted.reverse)
    }
  }

  test("kmeans-trained IVF quality gate: exact under full probe, monotone, measured vs labels") {
    // r9 verdict #6: the MLlib trainer is the production centroid path but
    // was only invariant-tested. Gates that hold on ANY corpus: a full
    // probe (nprobe = nlist) must recover the exact top-k verbatim (a
    // broken assignment cannot hide), and recall must be monotone in
    // nprobe. The kmeans-vs-label COMPARISON is measured and recorded but
    // deliberately NOT asserted ">=": on this fixture the labels are the
    // GENERATIVE truth (each memory reuses a labeled embedding vector
    // verbatim, Corpus.memories' doc_id % nVecs join), so the label
    // centroids are unbeatable by construction — measured kmeans 0.2 vs
    // label 0.4 recall@10 at nlist=10/nprobe=2 (COVERAGE.md round-10). A
    // real corpus has no labels; there the trainer is the only option.
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val exact = graft.search.VectorSearch.topK(mem, qv, 10, includeArchived = true)
      .select("id").as[Long].collect().toSet
    val labelCent = Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
      .localCheckpoint(true)
    val nlist = labelCent.count().toInt
    def recall(assigned: org.apache.spark.sql.DataFrame,
               cent: org.apache.spark.sql.DataFrame, nprobe: Int): Double = {
      val got = Ann.ivfTopK(assigned, cent, qv, k = 10, nprobe = nprobe)
        .select("id").as[Long].collect().toSet
      got.intersect(exact).size / 10.0
    }
    val emb = mem.select(col("id"), col("embedding")).localCheckpoint(true)
    val (kAssigned0, kCent) = graft.ann.IndexBuild.kmeansIvf(emb, nlist = nlist)
    val kAssigned = kAssigned0.localCheckpoint(true)
    // exactness: probing every cell IS the exact scan
    assert(recall(kAssigned, kCent, nlist) == 1.0,
      "full-probe recall < 1: the trained assignment lost rows")
    // monotonicity in nprobe
    val curve = Seq(1, 2, 4).map(np => recall(kAssigned, kCent, np))
    assert(curve == curve.sorted, s"recall not monotone in nprobe: $curve")
    assert(curve(1) > 0.0, "nprobe=2 recall is zero — degenerate clustering")
    val labelRecall = recall(Ann.assign(emb, labelCent), labelCent, 2)
    info(s"recall@10 at nlist=$nlist nprobe=2: kmeans=${curve(1)} label=$labelRecall")
  }

  test("IVF recall is monotone non-decreasing in nprobe") {
    val rows = Queries.all("ann_ivf_nprobe_sweep")(spark, sf())
      .as[(Int, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(1, 2, 4))
    assert(rows.map(_._2) == rows.map(_._2).sorted,
      s"recall not monotone: $rows")
  }

  test("2-core keeps the triangle, peels the tail, and dissolves a chain") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val core = GraphSearch.kCore(g, k = 2).as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(GraphSearch.kCore(chain, k = 2).count() == 0)
  }

  test("kCore fails loudly when the peel budget is exhausted") {
    // a 12-node chain peels its 2 endpoints per round: the 2-core is empty
    // but reaching it takes ~6 rounds, so a 2-round budget must THROW —
    // returning the partially-peeled superset would be a wrong answer with
    // no signal at 100× scale
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      GraphSearch.kCore(chain, k = 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("fixpoint"))
    assert(GraphSearch.kCore(chain, k = 2).count() == 0)
  }

  test("IVF-PQ recall is monotone non-decreasing in the ADC candidate budget") {
    // a larger candidate budget reranks a SUPERSET of the pool by exact
    // similarity, so recall@k vs the exact top-k cannot decrease — the
    // guarantee behind the sweep's scaled-candidates remedy
    val emb = Tables.embeddings(spark, sf())
    val cent = Ann.centroidsByLabel(emb)
    val mem = Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val assigned = Ann.assign(mem, cent).localCheckpoint(true)
    val books = Pq.residualCodebooks(emb, cent)
    val exact = graft.search.VectorSearch
      .topK(mem, qv, 10, includeArchived = true)
      .select("id").as[Long].collect().toSet
    val recalls = Seq(10, 50, 100).map { cand =>
      Pq.ivfPqTopK(assigned, cent, books, qv, k = 10, nprobe = 4,
          candidates = cand)
        .select("id").as[Long].collect().count(exact)
    }
    assert(recalls == recalls.sorted, s"not monotone: $recalls")
  }

  test("kCore accepts a peel that empties exactly on the last budgeted round") {
    // 5-node chain: round 1 → 2 edges, round 2 → 0. With maxRounds = 2
    // the count changed on the final round, but empty IS the fixpoint —
    // this must return the empty 2-core, not throw (round-8 review find)
    val chain = (1L to 4L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assert(GraphSearch.kCore(chain, k = 2, maxRounds = 2).count() == 0)
  }

  test("reliable-checkpoint flag: identical kCore through the checkpoint dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kcore_ckpt").toString
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val local = GraphSearch.kCore(g, k = 2).collect().toSeq
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(GraphSearch.ReliableCheckpointConf, "true")
    try {
      assert(GraphSearch.kCore(g, k = 2).collect().toSeq == local)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .anyMatch(p => java.nio.file.Files.isRegularFile(p))
      assert(wrote, s"no checkpoint files under $dir")
    } finally {
      spark.conf.set(GraphSearch.ReliableCheckpointConf, "false")
      graft.sources.Store.deleteRecursive(dir)
    }
  }

  test("the k-core oracle's unroll depth covers the sf0.01 fixpoint") {
    // the oracle unrolls 12 peels; pin that 12 rounds reach the fixpoint
    // at the SAME scale the driver's oracle runs (measured 9 in round 7)
    val pairs = graft.dedup.Dedup
      .findDuplicates(Corpus.memories(spark, sf("sf0.01")), threshold = 0.35)
      .select("id_a", "id_b").localCheckpoint(true)
    def rows(maxRounds: Int) =
      GraphSearch.kCore(pairs, k = 2, maxRounds = maxRounds)
        .collect().map(_.toString).toSeq
    assert(rows(12) == rows(20))
  }

  test("a star graph is perfectly disassortative and its degree histogram is exact") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    // degrees 3,1,1,1: M=3, sum jk=9, sum(j+k)=12, sum(j^2+k^2)=30
    // -> r = (4*3*9-144)/(2*3*30-144) = -36/36 = -1
    val r = GraphSearch.assortativity(star).collect().head
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Double]("assortativity") == -1.0)
    val hist = GraphSearch.degreeDistribution(star)
      .as[(Long, Long)].collect().toSeq
    assert(hist == Seq((1L, 3L), (3L, 1L)))
  }

  test("Flesch score matches the hand computation") {
    val docs = Seq((1L, "the cat. a dog.")).toDF("id", "text")
    val r = graft.text.TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Long]("n_words") == 4)
    assert(r.getAs[Long]("n_sentences") == 2)
    assert(r.getAs[Long]("n_syllables") == 4)
    // 206.835 - 1.015*(4/2) - 84.6*(4/4) = 120.205
    assert(r.getAs[Double]("flesch") == 120.205)
  }

  test("boilerplate removal drops corpus-wide lines, keeps order, and leaves rare lines") {
    val docs = (0 until 12).map { i =>
      (i.toLong, s"unique opening $i\nshared footer line\nunique closing $i")
    }.toDF("id", "text")
    val out = Curation.boilerplateLines(docs, minDocs = 10)
      .orderBy("id")
      .select("id", "n_lines", "n_boiler", "text_clean")
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 12)
    out.foreach { case (id, nl, nb, clean) =>
      assert(nl == 3 && nb == 1)
      assert(clean == s"unique opening $id\nunique closing $id")
    }
    // below the threshold nothing is boilerplate
    val out2 = Curation.boilerplateLines(docs, minDocs = 13)
      .agg(sum("n_boiler")).as[Long].collect().head
    assert(out2 == 0)
    // a doc that is ALL boilerplate cleans to the empty string
    val allBoiler = docs.unionAll(Seq((99L, "shared footer line")).toDF("id", "text"))
    val c99 = Curation.boilerplateLines(allBoiler, minDocs = 10)
      .filter(col("id") === 99).select("text_clean").as[String].collect().head
    assert(c99 == "")
  }

  test("OPH rotation densification fills empty bins from the next non-empty bin") {
    // bins: 32 % 32 = 0 (min 32), 65 % 32 = 1 (65); every other bin is
    // empty and rotates rightward (wrapping) to bin 0's value
    val sh = Seq((1L, Seq(32L, 65L))).toDF("id", "sh")
    val sig = graft.dedup.MinHashLsh.ophSignatures(sh)
      .select("sig").as[Seq[Long]].collect().head
    assert(sig.length == 32)
    assert(sig(0) == 32L && sig(1) == 65L)
    (2 until 32).foreach(i => assert(sig(i) == 32L, s"bin $i"))
  }

  test("OPH near-dup pairs are exact-verified true positives with nonzero recall") {
    val docs = Queries.docs(spark, sf())
    val oph = graft.dedup.MinHashLsh.nearDuplicatesOph(docs, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Queries.all("lsh_jaccard_exact")(spark, sf())
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oph.nonEmpty)
    assert(oph.subsetOf(exact), s"false positives: ${oph.diff(exact)}")
  }

  test("PMI ranks a planted collocation above independent pairs") {
    // "aa bb" always adjacent (perfect collocation); filler words pair
    // freely with everything — their PMI is near zero
    val docs = (0 until 10).map { i =>
      (i.toLong, s"aa bb x$i y$i x${(i + 1) % 10} aa bb y$i")
    }.toDF("id", "text")
    val top = graft.text.TextAnalysis.pmiCollocations(docs, minPair = 5, topK = 3)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect()
    assert(top.head._1 == "aa" && top.head._2 == "bb")
    assert(top.head._3 > 0)
  }

  test("JS divergence is 0 on identical slices and ln 2 on disjoint vocab") {
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("id", "source", "text")
    val js0 = graft.text.TextAnalysis
      .jsDivergence(same, col("source") === "a")
      .select("js").as[Double].collect().head
    assert(js0 == 0.0)
    val disjoint = Seq((1L, "a", "x y z"), (2L, "b", "p q r"))
      .toDF("id", "source", "text")
    val jsD = graft.text.TextAnalysis
      .jsDivergence(disjoint, col("source") === "a")
      .select("js").as[Double].collect().head
    assert(math.abs(jsD - math.log(2.0)) < 1e-5, s"js=$jsD")
    // the drift rows surface the disjoint terms with one-sided counts
    val rows = graft.text.TextAnalysis
      .termDrift(disjoint, col("source") === "a")
      .select("term", "n_a", "n_b").as[(String, Long, Long)].collect()
    assert(rows.length == 6)
    rows.foreach { case (_, a, b) => assert((a == 0) != (b == 0)) }
  }

  test("per-source top-k plans as a bounded aggregate, not a window shuffle") {
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE off so the physical tree is walkable (as in AnnSpec/PlanAuditSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.all("tc_top_per_source")(spark, sf())
      df.collect()
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "TopKScored query must not plan a Window")
      val aggs = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggs.nonEmpty, "expected the TypedImperativeAggregate in the plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("weighted sampling excludes non-positive weights and is deterministic") {
    val docs = Seq((1L, 0.9), (2L, 0.5), (3L, 0.0), (4L, -1.0), (5L, 0.7))
      .toDF("id", "quality")
    val all = Curation.weightedSample(docs, n = 10)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 5L)) // zero/negative weights never sample
    val k2a = Curation.weightedSample(docs.repartition(3), n = 2)
      .select("id").as[Long].collect().toSeq
    val k2b = Curation.weightedSample(docs, n = 2)
      .select("id").as[Long].collect().toSeq
    assert(k2a == k2b && k2a.length == 2) // partition-invariant
  }
}
