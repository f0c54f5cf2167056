package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, IndexBuild, IvfIndex}
import graft.core.{Corpus, Tables}
import graft.dedup.Dedup

/** ANN invariants: IVF recall vs the exact scan, k-means build sanity,
  * LSH join soundness (no false negatives below the radius among returned
  * pairs; distances correct). */
class AnnSpec extends SparkSpec {

  import spark.implicits._

  test("IVF top-k is a subset-of-corpus rescoring: probed hits match exact sims") {
    val mem = Corpus.memories(spark, sf())
    val cent = Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val qv = Queries.queryVec(spark, sf())
    val assigned = Ann.assign(mem, cent)
    val ivf = Ann.ivfTopK(assigned, cent, qv, k = 10, nprobe = 2)
      .select("id", "sim").as[(Long, Double)].collect().toMap
    val exact = graft.search.VectorSearch.topK(mem, qv, 200, includeArchived = true)
      .select("id", "sim").as[(Long, Double)].collect().toMap
    // every IVF hit's similarity equals the exact similarity for that id
    ivf.foreach { case (id, s) => assert(exact.get(id).forall(_ == s)) }
    // recall@10 against exact top-10 should be positive (cells share mass)
    val exactTop = graft.search.VectorSearch.topK(mem, qv, 10, includeArchived = true)
      .select("id").as[Long].collect().toSet
    assert(ivf.keySet.intersect(exactTop).nonEmpty)
  }

  test("persisted IVF equals in-memory IVF and prunes unprobed cells at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = "/root/repo/target/tmp/ivf_index_spec"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    graft.ann.IvfIndex.build(mem, emb, path)
    val fromIndex = graft.ann.IvfIndex.topK(spark, path, qv, k = 10, nprobe = 2)
    val cent = Ann.centroidsByLabel(emb)
    val inMemory = Ann.ivfTopK(Ann.assign(mem, cent), cent, qv, k = 10, nprobe = 2)
      .select("id", "ivf_cell", "sim")
    assert(fromIndex.collect().toSeq == inMemory.collect().toSeq)
    // pruning is planning-time: the probe's scan lists strictly fewer files
    // than the stored index holds, and the scan carries a PartitionFilter
    // (AQE off so the physical tree is walkable, as in PlanAuditSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val raw = graft.ann.IvfIndex.topK(spark, path, qv, k = 10, nprobe = 2)
      raw.collect() // populate scan metrics
      val scans = raw.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      val probed = scans.map(_.metadata("PartitionFilters"))
      assert(probed.exists(_.contains("ivf_cell")), probed.mkString("; "))
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      val filesStored = graft.sources.Store.load(spark, s"$path/assignments")
        .inputFiles.length
      assert(filesRead > 0 && filesRead < filesStored,
        s"read $filesRead of $filesStored files — no pruning?")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("delta probing (fromRank) scans only the newly-ranked cells and composes to the full probe") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = "/root/repo/target/tmp/ivf_delta_spec"
    graft.sources.Store.deleteRecursive(path)
    def emb(c: Int, i: Int): Array[Float] = {
      val a = Array.fill(4)(0.02f * (i % 3)); a(c) = 1.0f
      val n = math.sqrt(a.map(x => x.toDouble * x).sum).toFloat
      a.map(_ / n)
    }
    def axis(c: Int): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(c) = 1.0f; a.toSeq
    }
    val mem = (1 to 40).map(i => (i.toLong, emb((i - 1) / 10, i)))
      .toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(mem,
      (0 to 3).map(c => (c, axis(c))).toDF("label", "centroid"), path)
    val qv = axis(0) // cell ranking: 0, then 1/2/3 by label tie-break
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "ivf_cell", "sim").as[(Long, Int, Double)]
        .collect().sortBy(_._1).toSeq
    // range composition: probe(0,2] ∪ probe(2,4] ≡ probe(0,4] — what makes
    // the widened escalation round semantically a no-op vs a full re-probe
    val full = rows(graft.ann.IvfIndex.probedCandidates(spark, path, qv, 4))
    val kept = rows(graft.ann.IvfIndex.probedCandidates(spark, path, qv, 2))
    val delta = graft.ann.IvfIndex.probedCandidates(spark, path, qv, 4, fromRank = 2)
    assert((kept ++ rows(delta)).sortBy(_._1) == full,
      "range probes must compose to the full probe")
    // the delta frame carries ONLY the newly-ranked cells...
    assert(rows(delta).map(_._2).toSet == Set(2, 3),
      s"delta cells: ${rows(delta).map(_._2).toSet}")
    // ...and its SCAN lists only their dirs (planning-time prune, AQE off
    // so the physical tree is walkable)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f }
          .map(_.metrics("numFiles").value).sum
      }
      val fFull = filesRead(
        graft.ann.IvfIndex.probedCandidates(spark, path, qv, 4))
      val fDelta = filesRead(
        graft.ann.IvfIndex.probedCandidates(spark, path, qv, 4, fromRank = 2))
      assert(fDelta > 0 && fDelta < fFull,
        s"delta read $fDelta of the full probe's $fFull files — no delta prune?")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("IVF refresh against stored centroids reproduces the full rebuild") {
    val pathA = "/root/repo/target/tmp/ivf_index_full"
    val pathB = "/root/repo/target/tmp/ivf_index_inc"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    val half = Corpus.nDocs(spark, sf()) / 2
    graft.ann.IvfIndex.build(mem, emb, pathA)
    graft.ann.IvfIndex.build(mem.filter(col("id") < half), emb, pathB)
    graft.ann.IvfIndex.refresh(spark, pathB, mem.filter(col("id") >= half))
    val a = graft.sources.Store.load(spark, s"$pathA/assignments")
      .select("id", "ivf_cell").orderBy("id").collect().toSeq
    val b = graft.sources.Store.load(spark, s"$pathB/assignments")
      .select("id", "ivf_cell").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("IVF delete-refresh ≡ rebuild over the survivors (same stored centroids)") {
    val pathA = "/root/repo/target/tmp/ivf_index_delref"
    val pathB = "/root/repo/target/tmp/ivf_index_delreb"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    graft.ann.IvfIndex.build(mem, emb, pathA)
    graft.ann.IvfIndex.deleteRefresh(spark, pathA,
      mem.filter(col("id") % 3 === 1).select("id"))
    graft.ann.IvfIndex.build(mem.filter(col("id") % 3 =!= 1), emb, pathB)
    val qv = Queries.queryVec(spark, sf())
    val a = graft.ann.IvfIndex.topK(spark, pathA, qv, k = 20, nprobe = 2).collect().toSeq
    val b = graft.ann.IvfIndex.topK(spark, pathB, qv, k = 20, nprobe = 2).collect().toSeq
    assert(a == b, "tombstone maintenance must equal a reduced-corpus rebuild")
    // and the deleted ids are really unservable, not merely down-ranked
    val live = graft.sources.Store.load(spark, s"$pathA/assignments")
      .select("id").as[Long].collect().toSet
    assert(live.forall(_ % 3 != 1) && live.nonEmpty)
  }

  test("IVF upsert-refresh re-cells a moved vector atomically") {
    val path = "/root/repo/target/tmp/ivf_index_upsert"
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    graft.ann.IvfIndex.build(mem, emb, path)
    // a changed doc takes the embedding of another doc ~half the corpus
    // away — very likely a different cell for at least one of the batch
    val nd = Corpus.nDocs(spark, sf())
    val donor = mem.select((col("id") - nd / 2).as("id"), col("embedding").as("_e"))
    val changed = mem.select("id").filter(col("id") % 100 === 0).join(donor, "id")
      .select(col("id"), col("_e").as("embedding"))
    graft.ann.IvfIndex.upsertRefresh(spark, path, changed)
    val cent = graft.sources.Store.load(spark, s"$path/centroids")
    val expect = Ann.assign(changed, cent)
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    val got = graft.sources.Store.load(spark, s"$path/assignments")
      .join(changed.select("id"), "id")
      .select("id", "ivf_cell").as[(Long, Int)].collect()
    // exactly one live assignment per changed id (old one tombstoned)...
    assert(got.length == expect.size, s"${got.length} rows for ${expect.size} ids")
    // ...and it is the NEW cell
    got.foreach { case (id, cell) => assert(expect(id) == cell, s"id $id") }
  }

  test("driftAudit flags a planted growth + sim-drop shift against the build baseline") {
    val path = "/root/repo/target/tmp/ivf_drift_spec"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    // build: 4 tight docs per axis cell — mean assign-sim ≈ 1.0 each
    val seed = ((1L to 4L).map(i => (i, v(1, 0.01 * i))) ++
      (5L to 8L).map(i => (i, v(0.01 * i, 1)))).toDF("id", "embedding")
    val cents = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("label", "centroid")
    graft.ann.IvfIndex.buildWithCentroids(seed, cents, path)
    val audit0 = graft.ann.IvfIndex.driftAudit(spark, path)
      .select("ivf_cell", "retrain").as[(Int, Boolean)].collect().toMap
    assert(audit0 == Map(0 -> false, 1 -> false), s"fresh build must not flag: $audit0")
    // churn: 10 vectors near the 45° boundary flood cell 0 — its
    // population grows 3.5× and its mean sim collapses toward 0.72
    val flood = (20L to 29L).map(i => (i, v(0.72, 0.7))).toDF("id", "embedding")
    graft.ann.IvfIndex.refresh(spark, path, flood)
    val audit = graft.ann.IvfIndex.driftAudit(spark, path,
        growthLimit = 2.0, simDropLimit = 0.1)
      .select("ivf_cell", "n_built", "n_now", "growth", "sim_drop", "retrain")
      .as[(Int, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(audit(0)._3 == 14L && audit(0)._2 == 4L && audit(0)._4 == 3.5)
    assert(audit(0)._5 > 0.1 && audit(0)._6, s"flooded cell must flag retrain: ${audit(0)}")
    assert(!audit(1)._6, s"untouched cell must not flag: ${audit(1)}")
  }

  test("retrainCells recenters ONLY the flagged cell, re-seeds its baseline, leaves others byte-untouched") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val path = "/root/repo/target/tmp/ivf_retrain_spec"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = ((1L to 4L).map(i => (i, v(1, 0.01 * i))) ++
      (5L to 8L).map(i => (i, v(0.01 * i, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"), path)
    val flood = (20L to 29L).map(i => (i, v(0.72, 0.7))).toDF("id", "embedding")
    graft.ann.IvfIndex.refresh(spark, path, flood)
    val flagged = graft.ann.IvfIndex.driftAudit(spark, path)
      .filter(col("retrain")).select("ivf_cell").as[Int].collect().toSeq
    assert(flagged == Seq(0))
    val preOther = graft.sources.Store.load(spark, s"$path/assignments")
      .filter(col("ivf_cell") === 1)
      .select("id", "csim").as[(Long, Double)].collect().toMap
    def asgFiles() = {
      val w = Files.walk(Paths.get(path, "assignments", "data"))
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
      finally w.close()
    }
    val before = asgFiles()
    graft.ann.IvfIndex.retrainCells(spark, path, flagged)
    val after = asgFiles()
    // immutability + targeting: no pre-existing file rewritten; every new
    // data file lands in the flagged cell's dir (in this 2-D fixture no
    // member can migrate — recentring keeps c0 inside its own cone)
    assert(before.subsetOf(after), s"missing: ${before -- after}")
    val added = (after -- before).filter(_.matches(".*/data/b\\d+/.*"))
    assert(added.nonEmpty)
    assert(added.forall(_.contains("ivf_cell=0/")),
      s"retrain wrote outside the flagged cell: ${added.filterNot(_.contains("ivf_cell=0/"))}")
    // row count preserved; the unflagged cell's rows are identical
    val post = graft.sources.Store.load(spark, s"$path/assignments")
    assert(post.count() == 18L)
    assert(post.filter(col("ivf_cell") === 1)
      .select("id", "csim").as[(Long, Double)].collect().toMap == preOther)
    // the recentred centroid moved toward the flood; the other is untouched
    val cents = graft.sources.Store.load(spark, s"$path/centroids")
      .select("label", "centroid").as[(Int, Seq[Double])].collect().toMap
    assert(math.abs(cents(1)(0)) < 1e-12 && math.abs(cents(1)(1) - 1.0) < 1e-12)
    assert(cents(0)(1) > 0.3, s"c0 must tilt toward the flood: ${cents(0)}")
    assert(math.abs(cents(0).map(x => x * x).sum - 1.0) < 1e-9, "c0 must stay unit-norm")
    // baseline re-seeded: the audit measured from the retrain point is clean
    val audit = graft.ann.IvfIndex.driftAudit(spark, path)
      .select("ivf_cell", "n_built", "n_now", "growth", "sim_drop", "retrain")
      .as[(Int, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(audit(0)._2 == 14L && audit(0)._3 == 14L && audit(0)._4 == 1.0 &&
      audit(0)._5 == 0.0 && !audit(0)._6, s"re-seeded cell must read clean: ${audit(0)}")
    assert(!audit(1)._6)
    // mean assign-sim of the flagged cell IMPROVED against its own centroid
    val msNow = post.filter(col("ivf_cell") === 0).agg(avg("csim")).head().getDouble(0)
    assert(msNow > 0.9, s"recentring must lift the flooded cell's mean sim: $msNow")
  }

  test("split-on-retrain: a planted bimodal flood bisects into a new cell and the audit reads clean") {
    val path = "/root/repo/target/tmp/ivf_split_spec"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    // cell 0 built from 5 members AT its centroid; cell 1 has 2 bystanders
    val seed = ((1L to 5L).map(i => (i, v(1, 0))) ++
      Seq((6L, v(0, 1)), (7L, v(0, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"), path)
    // a SECOND mode floods cell 0: 11 vectors at (0.8, 0.6) — argmax keeps
    // them in cell 0, growth 16/5 > 2 flags it
    val flood = (10L to 20L).map(i => (i, v(0.8, 0.6))).toDF("id", "embedding")
    graft.ann.IvfIndex.refresh(spark, path, flood)
    val flagged = graft.ann.IvfIndex.driftAudit(spark, path)
      .filter(col("retrain")).select("ivf_cell").as[Int].collect().toSeq
    assert(flagged == Seq(0))
    // one recenter step cannot fix bimodality: the recentered mean sits
    // between the modes (post-recenter mean csim ≈ 0.956 < the 0.97
    // floor) — the cell bisects: seed B = the farthest member (the
    // original (1,0) mode), so the originals move to the NEW cell 2 and
    // the flood keeps cell 0, each half at its own exact centroid
    graft.ann.IvfIndex.retrainCells(spark, path, flagged,
      splitSimFloor = Some(0.97))
    val post = graft.sources.Store.load(spark, s"$path/assignments")
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert((1L to 5L).forall(post(_) == 2), s"originals must split out: $post")
    assert((10L to 20L).forall(post(_) == 0), s"flood must keep the cell: $post")
    assert(post(6L) == 1 && post(7L) == 1)
    val cents = graft.sources.Store.load(spark, s"$path/centroids")
      .select("label", "centroid").as[(Int, Seq[Double])].collect().toMap
    assert(cents.keySet == Set(0, 1, 2), s"labels: ${cents.keySet}")
    assert(math.abs(cents(2)(0) - 1.0) < 1e-9 && math.abs(cents(2)(1)) < 1e-9,
      s"new cell centroid must be the split-out mode: ${cents(2)}")
    assert(math.abs(cents(0)(0) - 0.8) < 1e-6 && math.abs(cents(0)(1) - 0.6) < 1e-6,
      s"kept cell centroid must be the flood mode: ${cents(0)}")
    // baselines re-seeded for BOTH halves: the next audit is clean
    val audit = graft.ann.IvfIndex.driftAudit(spark, path)
      .select("ivf_cell", "n_built", "n_now", "retrain")
      .as[(Int, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(audit.keySet == Set(0, 1, 2))
    assert(audit(0)._2 == 11L && audit(0)._3 == 11L && !audit(0)._4)
    assert(audit(2)._2 == 5L && audit(2)._3 == 5L && !audit(2)._4)
    assert(!audit(1)._4)
    // probes serve the split layout: a (1,0) query's nearest cell is now 2
    val top = graft.ann.IvfIndex.topK(spark, path, Seq(1.0f, 0.0f), k = 5, nprobe = 1)
      .select("id").as[Long].collect().toSet
    assert(top == Set(1L, 2L, 3L, 4L, 5L), s"probe must hit the split-out mode: $top")
    // and a retrain WITHOUT the floor (default) still behaves as before:
    // no split, one cell — pinned by the retrainCells test above
  }

  test("split-on-retrain fail-louds when bisection would grow the live cell count past MaxNlist") {
    val path = "/root/repo/target/tmp/ivf_split_cap_spec"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    // a centroid table already AT MaxNlist: cell 0 is live with a planted
    // bimodal population; the other MaxNlist−1 centroids point away from
    // every member, so nothing migrates on recenter
    val cents = (0 until graft.ann.Ann.MaxNlist).map(i =>
      if (i == 0) (i, Seq(0.7071f, 0.7071f)) else (i, Seq(-1.0f, 0.0f)))
      .toDF("label", "centroid")
    val members = ((1L to 10L).map(i => (i, v(1, 0))) ++
      (11L to 20L).map(i => (i, v(0, 1)))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(members, cents, path)
    // post-recenter mean csim ≈ 0.707 < the floor ⇒ cell 0 wants to
    // bisect — but a new label would make MaxNlist+1 live cells, past the
    // bound every centroid broadcast and probe-boundedness argument sizes
    // against: fail loud instead of silently creeping
    val e = intercept[IllegalArgumentException] {
      graft.ann.IvfIndex.retrainCells(spark, path, Seq(0),
        splitSimFloor = Some(0.9))
    }
    assert(e.getMessage.contains("MaxNlist"), e.getMessage)
    // the failed call never published: assignments and centroids untouched
    assert(graft.sources.Store.load(spark, s"$path/assignments").count() == 20L)
    assert(graft.sources.Store.load(spark, s"$path/centroids").count() ==
      graft.ann.Ann.MaxNlist.toLong)
  }

  test("IVF refresh fail-louds on already-indexed and duplicate ids; the index never moves") {
    val path = "/root/repo/target/tmp/ivf_guard_spec"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("id", "embedding")
    graft.ann.IvfIndex.buildWithCentroids(seed,
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"), path)
    val e1 = intercept[IllegalArgumentException] {
      graft.ann.IvfIndex.refresh(spark, path, Seq((1L, v(1, 0))).toDF("id", "embedding"))
    }
    assert(e1.getMessage.contains("ALREADY indexed"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ann.IvfIndex.refresh(spark, path,
        Seq((3L, v(1, 0)), (3L, v(0, 1))).toDF("id", "embedding"))
    }
    assert(e2.getMessage.contains("duplicate ids"))
    assert(graft.sources.Store.load(spark, s"$path/assignments").count() == 2L)
    // upsertRefresh is the sanctioned re-crawl path for the same id
    graft.ann.IvfIndex.upsertRefresh(spark, path, Seq((1L, v(0, 1))).toDF("id", "embedding"))
    val cells = graft.sources.Store.load(spark, s"$path/assignments")
      .select("id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(cells == Map(1L -> 1, 2L -> 1))
  }

  test("splitSkewedCells: a planted hot cell splits balanced; cold cells don't; probe unchanged") {
    val mem = Corpus.memories(spark, sf())
    val cent = Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val assigned = Ann.assign(mem, cent).localCheckpoint(true)
    // plant the hot cluster: find the largest cell, set the bound to a
    // quarter of it — that cell MUST split ≥4 ways, the smallest must not
    val sizes = assigned.groupBy("ivf_cell").count()
      .as[(Int, Long)].collect().toMap
    val hot = sizes.maxBy(_._2)._1
    val cold = sizes.minBy(_._2)._1
    val bound = math.max(1L, sizes(hot) / 4)
    val split = Ann.splitSkewedCells(assigned, bound).localCheckpoint(true)
    val hotSubs = split.filter(col("ivf_cell") === hot)
      .groupBy("ivf_subcell").count().as[(Int, Long)].collect()
    assert(hotSubs.length >= 4, s"hot cell split only ${hotSubs.length} ways")
    // balance: xxhash64 spread keeps every subcell within 2x of the mean
    val mean = hotSubs.map(_._2).sum.toDouble / hotSubs.length
    assert(hotSubs.forall(s => s._2 < 2 * mean),
      s"unbalanced subcells: ${hotSubs.toSeq}")
    if (sizes(cold) <= bound)
      assert(split.filter(col("ivf_cell") === cold)
        .select("ivf_subcell").distinct().count() == 1,
        "an under-bound cell must keep the single subcell 0")
    // probe semantics: identical rows to the unsplit assignment
    val qv = Queries.queryVec(spark, sf())
    val a = Ann.ivfTopK(assigned, cent, qv, k = 20, nprobe = 2)
      .select("id", "ivf_cell", "sim").collect().toSeq
    val b = Ann.ivfTopK(split, cent, qv, k = 20, nprobe = 2)
      .select("id", "ivf_cell", "sim").collect().toSeq
    assert(a == b)
    // and the physical story: partitioned by (cell, subcell), the hot
    // cell's rows land in ≥4 scan-parallel subdirectories
    val path = "/root/repo/target/tmp/ivf_split_layout"
    graft.sources.Store.deleteRecursive(path)
    split.write.partitionBy("ivf_cell", "ivf_subcell").parquet(path)
    val subdirs = new java.io.File(s"$path/ivf_cell=$hot").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ivf_subcell="))
    assert(subdirs >= 4, s"expected >=4 subcell dirs under the hot cell, got $subdirs")
  }

  test("kmeans IVF build assigns every row to a valid cell") {
    val emb = Tables.embeddings(spark, sf()).select(col("vec_id").as("id"), col("embedding"))
    val (assigned, centroids) = IndexBuild.kmeansIvf(emb, nlist = 4, maxIter = 5)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("ivf_cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet) && cells.nonEmpty)
    assert(centroids.count() == 4)
  }

  test("trained IVF build: exhaustive probe IS brute top-k; recall beats positional seeding") {
    // r15 verdict #3 — the production trained-centroid build path,
    // measured against the production POSITIONAL seeding on the real
    // fixture corpus (a synthetic blob fixture degenerates: symmetric
    // label mixes give near-identical centroids, so assignment collapses
    // to one cell and nprobe 1 "recall" is trivially perfect with zero
    // pruning). Here: the pid-mod-8 passage seeding vs the trained build
    // over the same exploded passage embeddings, on the same
    // ivfRecallSweep ladder the verdict's instrument reads. Measured
    // rung-1 recall: sf0.001 fixture 650685 vs 517808 ppm, sf0.01
    // (ev_passage_recall's corpus) 725850 vs 585714 ppm — trained wins
    // every rung at both scales; this pin asserts the inequality, not
    // the exact ppm (MLlib k-means is partitioning-reproducible, not
    // SQL-oracle-able — the standing kmeans adjudication).
    val pages = Queries.c4Pages(spark, sf())
    val emb = graft.search.Passage.passageEmbeddings(pages)
      .localCheckpoint(true)
    val trainedPath = "/root/repo/target/tmp/ann_trained_ivf"
    val posPath = "/root/repo/target/tmp/ann_pos_ivf"
    Seq(trainedPath, posPath).foreach(graft.sources.Store.deleteRecursive)
    // nlist PINNED to the positional build's 8 so the rung compares
    // seeding quality alone, not cell-count pruning (the no-arg default
    // auto-sizes by suggestNlist — pinned end to end by its own test)
    graft.search.Passage.buildIndexTrained(pages, trainedPath, nlist = Some(8))
    graft.search.Passage.buildIndex(pages, posPath)
    def rung1(path: String): Long = graft.eval.RetrievalEval
      .ivfRecallSweep(spark, emb, path, nprobes = Seq(1))
      .select("recall_ppm").head.getLong(0)
    val (tr, pr) = (rung1(trainedPath), rung1(posPath))
    assert(tr > pr, s"trained seeding must beat positional recall: $tr vs $pr")
    // the win is genuine pruning, not a degenerate all-in-one-cell index:
    // every trained cell is non-empty and none holds most of the corpus
    val cells = graft.sources.Store
      .load(spark, s"$trainedPath/assignments")
      .groupBy("ivf_cell").count()
      .select("count").as[Long].collect()
    val n = emb.count()
    assert(cells.length == 8 && cells.max < n / 2,
      s"trained cells must spread the corpus: ${cells.toSeq.sorted} of $n")
    Seq(trainedPath, posPath).foreach(graft.sources.Store.deleteRecursive)
  }

  test("defaulted-nlist trained build: suggestNlist sizes the cells, reads stay exact (r16 verdict #2)") {
    // the no-arg production path end to end: build with NO nlist, assert
    // the index materialized exactly suggestNlist(rows) cells (k-means
    // may leave a cell empty only if duplicate points collapse — the
    // fixture's vectors are distinct), every row is assigned, and an
    // exhaustive probe through the defaulted index reproduces brute
    // top-k bit for bit (the read path is untouched by the sizing)
    val mem = Corpus.memories(spark, sf())
    val path = "/root/repo/target/tmp/ann_autonlist_ivf"
    graft.sources.Store.deleteRecursive(path)
    graft.ann.IvfIndex.buildTrained(mem, path)
    val rows = mem.count()
    val want = IndexBuild.suggestNlist(rows)
    val asg = graft.sources.Store.load(spark, s"$path/assignments")
    assert(asg.count() == rows, "every row must be assigned")
    val nCells = graft.ann.IvfIndex.cellCount(spark, path)
    assert(nCells == want,
      s"defaulted build must size cells by suggestNlist($rows) = $want, got $nCells")
    val qv = Queries.queryVec(spark, sf())
    val probed = graft.ann.IvfIndex
      .probedCandidates(spark, path, qv, nprobe = nCells)
      .orderBy(desc("sim"), asc("id")).limit(10)
      .select("id", "sim").as[(Long, Double)].collect().toSeq
    val brute = graft.search.VectorSearch
      .topK(mem, qv, k = 10, includeArchived = true)
      .select("id", "sim").as[(Long, Double)].collect().toSeq
    assert(probed == brute,
      "exhaustive probe through the defaulted index must be brute top-k")
    graft.sources.Store.deleteRecursive(path)
  }

  test("two-level coarse quantizer: exhaustive probe IS the flat exhaustive probe; partial probe prunes (r16 verdict #6)") {
    // the MaxNlist growth-path prototype, gated the kmeans-adjudication
    // way (invariant specs): the (cell, l2_cell) decomposition must be a
    // pure refinement — probing EVERYTHING through both levels reproduces
    // the flat exhaustive top-k (= brute) bit for bit, and a partial
    // probe reads a strict subset of the corpus. Recall at the partial
    // rung is logged for the design ledger (the flat ladder discipline).
    val mem = Corpus.memories(spark, sf())
    val cent = Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val assigned = Ann.assign(mem, cent).localCheckpoint(true)
    val fanout = 4
    val sub = graft.ann.TwoLevelIvf.subCentroids(assigned, fanout)
      .localCheckpoint(true)
    val assigned2 = graft.ann.TwoLevelIvf.assignSub(assigned, sub)
      .localCheckpoint(true)
    assert(assigned2.count() == mem.count(), "every row keeps a (cell, l2) slot")
    val nlist1 = cent.count().toInt
    val nSub = sub.count().toInt
    assert(nSub <= nlist1 * fanout)
    val qv = Queries.queryVec(spark, sf())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "sim").as[(Long, Double)].collect().toSeq
    val exhaustive = rows(graft.ann.TwoLevelIvf.probeTopK(
      assigned2, cent, sub, qv, k = 10, nprobe1 = nlist1, nprobe2 = nSub))
    val flat = rows(Ann.ivfTopK(assigned, cent, qv, k = 10, nprobe = nlist1))
    val brute = rows(graft.search.VectorSearch
      .topK(mem, qv, k = 10, includeArchived = true))
    assert(exhaustive == flat, "two-level exhaustive must equal flat exhaustive")
    assert(flat == brute, "flat exhaustive must equal brute top-k")
    // partial probe: strictly fewer scanned rows than the corpus, and the
    // scanned set is exactly the probed (cell, l2_cell) pairs' population
    val scanned = graft.ann.TwoLevelIvf.probeTopK(
      assigned2, cent, sub, qv, k = Int.MaxValue, nprobe1 = 2, nprobe2 = 4)
    val nScanned = scanned.count()
    assert(nScanned > 0 && nScanned < mem.count(),
      s"partial two-level probe must prune: scanned $nScanned of ${mem.count()}")
    val hit = rows(graft.ann.TwoLevelIvf.probeTopK(
        assigned2, cent, sub, qv, k = 10, nprobe1 = 2, nprobe2 = 4))
      .map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    info(s"two-level rung (np1=2, np2=4): scanned $nScanned/${mem.count()} rows, recall@10 = $hit/10")
  }

  test("persisted two-level index: the partition-pruned probe equals the in-session probe row for row") {
    // the r17 lifecycle slice (build + read): stored tables make both
    // quantizer levels exact, so the pruned read must reproduce the
    // in-session probeTopK at identical settings — the oracle gate
    // (ann_twolevel_indexed) adjudicates the same equality against DuckDB
    val path = "/root/repo/target/tmp/ann_2lvl_idx"
    graft.sources.Store.deleteRecursive(path)
    val mem = Corpus.memories(spark, sf())
    val emb = Tables.embeddings(spark, sf())
    graft.ann.TwoLevelIvf.buildIndex(mem, emb, path, fanout = 4)
    val qv = Queries.queryVec(spark, sf())
    val cent = Ann.centroidsByLabel(emb)
    val assigned = Ann.assign(mem, cent).localCheckpoint(true)
    val sub = graft.ann.TwoLevelIvf.subCentroids(assigned, 4).localCheckpoint(true)
    val assigned2 = graft.ann.TwoLevelIvf.assignSub(assigned, sub)
    val inSession = graft.ann.TwoLevelIvf
      .probeTopK(assigned2, cent, sub, qv, k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    val indexed = graft.ann.TwoLevelIvf
      .topKIndexed(spark, path, qv, k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    assert(indexed == inSession,
      s"persisted two-level probe diverged:\n indexed=$indexed\n insession=$inSession")
    graft.sources.Store.deleteRecursive(path)
  }

  test("two-level O(batch) refresh: stored-quantizer assignment, replay-guarded") {
    // refresh must equal assigning EVERY row against the STORED quantizer
    // tables (adds never move either level), and a replayed batch must
    // fail loud off the pruned id-sidecar read — the flat refresh
    // contract, both levels (the oracle gate ann_twolevel_refresh
    // adjudicates the same equality against the built-half replay)
    val path = "/root/repo/target/tmp/ann_2lvl_rf"
    graft.sources.Store.deleteRecursive(path)
    val mem = Corpus.memories(spark, sf())
    val half = Corpus.nDocs(spark, sf()) / 2
    graft.ann.TwoLevelIvf.buildIndex(
      mem.filter(col("id") < half), Tables.embeddings(spark, sf()),
      path, fanout = 4)
    graft.ann.TwoLevelIvf.refresh(spark, path, mem.filter(col("id") >= half))
    val qv = Queries.queryVec(spark, sf())
    val ld = graft.sources.IndexManifest.resolve(spark, path)
    val assigned2 = graft.ann.TwoLevelIvf.assignSub(
      Ann.assign(mem, ld("centroids")), ld("subcentroids"))
    val inSession = graft.ann.TwoLevelIvf
      .probeTopK(assigned2, ld("centroids"), ld("subcentroids"), qv,
        k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    val refreshed = graft.ann.TwoLevelIvf
      .topKIndexed(spark, path, qv, k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    assert(refreshed == inSession,
      "build-half + refresh must equal whole-corpus assignment against " +
        "the stored quantizers")
    val replayed = intercept[IllegalArgumentException] {
      graft.ann.TwoLevelIvf.refresh(spark, path, mem.filter(col("id") >= half))
    }
    assert(replayed.getMessage.contains("ALREADY"), replayed.getMessage)
    graft.sources.Store.deleteRecursive(path)
  }

  test("two-level O(batch) delete: tombstoned probe equals survivor assignment, unknown ids refuse") {
    // deletes move neither quantizer level, so the tombstoned read must
    // equal assigning the SURVIVORS against the stored tables; deleting
    // an id the index never held must fail loud off the sidecar read
    val path = "/root/repo/target/tmp/ann_2lvl_del"
    graft.sources.Store.deleteRecursive(path)
    val mem = Corpus.memories(spark, sf())
    graft.ann.TwoLevelIvf.buildIndex(
      mem, Tables.embeddings(spark, sf()), path, fanout = 4)
    graft.ann.TwoLevelIvf.deleteRefresh(spark, path,
      mem.filter(col("id") % 3 === 1).select("id"))
    val qv = Queries.queryVec(spark, sf())
    val ld = graft.sources.IndexManifest.resolve(spark, path)
    val survivors = mem.filter(col("id") % 3 =!= 1)
    val assigned2 = graft.ann.TwoLevelIvf.assignSub(
      Ann.assign(survivors, ld("centroids")), ld("subcentroids"))
    val inSession = graft.ann.TwoLevelIvf
      .probeTopK(assigned2, ld("centroids"), ld("subcentroids"), qv,
        k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    val deleted = graft.ann.TwoLevelIvf
      .topKIndexed(spark, path, qv, k = 10, nprobe1 = 2, nprobe2 = 4)
      .collect().toSeq
    assert(deleted == inSession,
      "tombstoned probe must equal survivor assignment against the " +
        "stored quantizers")
    val s = spark
    import s.implicits._
    val unknown = intercept[IllegalArgumentException] {
      graft.ann.TwoLevelIvf.deleteRefresh(spark, path,
        Seq(999999L).toDF("id"))
    }
    assert(unknown.getMessage.contains("mis-routed"), unknown.getMessage)
    graft.sources.Store.deleteRecursive(path)
  }

  test("two-level refresh fails loud when an added row lands in a cell with no sub-table") {
    // a brand-new level-1 cell has no stored sub-centroids; the cell-keyed
    // sub-assign join would silently drop its rows — refresh must refuse
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/ann_2lvl_rf_gap"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    // two labeled centroids, but every BUILT row sits in cell 0 — cell 1
    // gets no sub-table
    val emb = Seq((0, v(1, 0)), (1, v(0, 1))).toDF("label", "embedding")
    val built = Seq((1L, v(1, 0)), (2L, v(0.9, 0.1)), (3L, v(0.8, 0.2)),
      (4L, v(0.95, 0.05))).toDF("id", "embedding")
    graft.ann.TwoLevelIvf.buildIndex(built, emb, path, fanout = 2)
    val gap = intercept[IllegalArgumentException] {
      graft.ann.TwoLevelIvf.refresh(spark, path,
        Seq((9L, v(0, 1))).toDF("id", "embedding"))
    }
    assert(gap.getMessage.contains("no stored sub-centroids"), gap.getMessage)
    graft.sources.Store.deleteRecursive(path)
  }

  test("two-level BATCH probe is the per-query probed union (one pair-pruned scan for N queries)") {
    // the contract the recall ladder stands on: probedCandidatesBatch must
    // read, per qid, exactly the single-query pruned probe's candidate set
    // — the flat probedCandidatesBatch contract in two-level form
    val path = "/root/repo/target/tmp/ann_2lvl_batch"
    graft.sources.Store.deleteRecursive(path)
    val mem = Corpus.memories(spark, sf())
    graft.ann.TwoLevelIvf.buildIndex(
      mem, Tables.embeddings(spark, sf()), path, fanout = 4)
    val s = spark
    import s.implicits._
    val qids = Seq(0L, 1L)
    val qframe = qids.map(v => (v, Queries.queryVec(spark, sf(), v)))
      .toDF("qid", "qv")
    val batch = graft.ann.TwoLevelIvf
      .probedCandidatesBatch(spark, path, qframe, nprobe1 = 2, nprobe2 = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val singles = qids.flatMap { v =>
      graft.ann.TwoLevelIvf
        .probedCandidatesIndexed(spark, path, Queries.queryVec(spark, sf(), v),
          nprobe1 = 2, nprobe2 = 4)
        .select("id", "sim")
        .collect().map(r => (v, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles,
      s"batch probe diverged from the per-query union:\n batch=$batch\n singles=$singles")
    graft.sources.Store.deleteRecursive(path)
  }

  test("suggestNlist follows the 4·sqrt(N) guideline, bounded both ways") {
    assert(IndexBuild.suggestNlist(0L) == 1)
    assert(IndexBuild.suggestNlist(1L) == 1)      // never more cells than rows
    assert(IndexBuild.suggestNlist(100L) == 40)   // 4·sqrt(100)
    assert(IndexBuild.suggestNlist(1000000L) == 4000)
    assert(IndexBuild.suggestNlist(1000000000L) == Ann.MaxNlist)
    intercept[IllegalArgumentException](IndexBuild.suggestNlist(-1L))
  }

  test("BRP-LSH near-dup pairs carry correct L2 distances") {
    val emb = Tables.embeddings(spark, sf()).select(col("vec_id").as("id"), col("embedding"))
      .limit(150)
    val pairs = IndexBuild.lshNearDuplicates(emb, maxL2Dist = 1.2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(_._3 <= 1.2))
    assert(pairs.forall(p => p._1 < p._2))
    // cross-check one distance against the exact dot: d^2 ~= 2(1-cos)
    if (pairs.nonEmpty) {
      val (a, b, d) = pairs.head
      val e = emb.filter(col("id").isin(a, b))
        .select("id", "embedding").as[(Long, Array[Float])].collect().toMap
      val cos = e(a).zip(e(b)).map { case (x, y) => x.toDouble * y }.sum
      assert(math.abs(d * d - 2.0 * (1.0 - cos)) < 1e-3)
    }
  }
}
