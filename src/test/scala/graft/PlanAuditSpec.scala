package graft

import org.apache.spark.sql.functions._
import graft.core.{Corpus, Tables}

/** 100 TB plan audit: every registered query's PHYSICAL plan must be the
  * shape that survives a 1000-executor cluster — no unbounded cartesian
  * products, no accidental nested-loop joins, broadcast where a broadcast
  * was designed in, and column pruning reaching the parquet scans.
  *
  * These assertions pin the *plan*, not the answer: a refactor that keeps
  * results identical but regresses to a quadratic join or a full-width scan
  * fails here, at fixture scale, before any cluster sees it. */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a nested-loop/cartesian form,
    * each with the reason it is bounded. */
  private val nestedLoopAllowed: Map[String, String] = Map(
    "lsh_jaccard_exact" -> "O(n^2) exact-Jaccard BASELINE, bench-excluded by design",
    "d5_consolidation_clusters" -> "corpus bounded <= 500 rows like the reference (memory_engine.py:2575)"
    // ann_ivf_* no longer need an exemption: centroidsByLabel carries an
    // explicit limit(MaxNlist), so the cross-join build side is provably
    // bounded in the physical plan itself
  )

  /** Plan with AQE off so the physical tree is walkable (AdaptiveSparkPlan
    * is a leaf node that hides its subtree from collect). */
  private def rawPlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Queries.all(name)(spark, sf()).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def planOf(name: String): String = rawPlan(name).toString

  /** A build side is bounded — safe to nested-loop against at any corpus
    * size — iff its subtree reduces to a scalar (grouping-free aggregate),
    * a driver-local relation (profile/config tables), or an explicit limit. */
  private def bounded(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    p.find {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.isEmpty
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case r: org.apache.spark.sql.execution.RangeExec => r.numElements <= 1000
      // a reused exchange is as bounded as the exchange it reuses
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => bounded(r.child)
      // locally-checkpointed intermediates in this engine are pre-reduced
      // candidate frames (<= k or <= 2*oversample rows by construction:
      // HybridSearch contribs, evidencePacket's ranked top-k) — the
      // checkpoint erases the bounding operator from the plan, not the bound
      case _: org.apache.spark.sql.execution.RDDScanExec => true
      case _ => false
    }.isDefined

  test("no registered query plans an unbounded cartesian or nested-loop join") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val offenders = Queries.all.keys.toSeq.sorted.flatMap { name =>
      if (nestedLoopAllowed.contains(name)) None
      else {
        val plan = rawPlan(name)
        val cartesian = plan.collect { case c: CartesianProductExec => c }
        val unboundedBnlj = plan.collect {
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            bounded(build)
        }.contains(false)
        if (cartesian.nonEmpty || unboundedBnlj) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes in: ${offenders.mkString(", ")}")
  }

  test("vector top-k prunes text out of the documents scan and broadcasts the embeddings dim") {
    val plan = graft.search.VectorSearch.topK(
      Corpus.memories(spark, sf()), Queries.queryVec(spark, sf()), k = 10)
      .select("id", "sim").queryExecution.executedPlan.toString
    // the 10-row result needs doc_id + embedding (+ visibility cols) but
    // never the document text: pruning must reach the parquet reader
    val docScans = plan.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("documents")).mkString("\n")
    assert(docScans.nonEmpty, "expected a parquet scan of documents")
    assert(!docScans.contains("text"), s"text not pruned from scan:\n$docScans")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "embeddings dim-table join should broadcast")
  }

  test("temporal/prefix filters are pushed down to the parquet scan") {
    val plan = Tables.documents(spark, sf())
      .filter(col("source").startsWith("src1") && col("n_chars") > 100)
      .select("doc_id", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      (plan.contains("StringStartsWith(source,src1") || plan.contains("GreaterThan(n_chars,100")),
      s"expected pushed filters in:\n$plan")
  }

  test("partitioned store prunes directories for source-prefix reads") {
    import org.apache.spark.sql.functions._
    val path = "/root/repo/target/tmp/audit_parted"
    val mem = Corpus.memories(spark, sf())
      .withColumn("folder", split(col("source"), "/").getItem(0))
    graft.sources.Store.savePartitioned(mem, path, "folder")
    val plan = graft.sources.Store.load(spark, path)
      .filter(col("folder") === "src1").select("id", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("folder"),
      s"expected partition pruning on folder in:\n$plan")
    // the pruned scan must not carry the predicate as a data filter too:
    // pruning happens at planning time, whole directories are never opened
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.nonEmpty)
  }

  test("tombstoned generational read: broadcast anti-join, partition pruning preserved") {
    // the merge-on-read contract at scale: a tombstoned table's read must
    // (a) BROADCAST the (batch-sized) tombstone keys — never shuffle the
    // table for the mask — and (b) keep planning-time hive pruning on
    // partition-column predicates through the fold's union+anti-join
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/audit_tomb"
    graft.sources.Store.deleteRecursive(path)
    graft.sources.Store.savePartitioned(
      (0L until 100L).map(i => (i, (i % 4).toInt)).toDF("id", "cell"),
      path, "cell")
    graft.sources.Store.deleteBatch(spark, path, Seq(5L, 6L).toDF("id"))
    val q = graft.sources.Store.load(spark, path)
      .filter(col("cell") === 1).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone mask must be a broadcast anti-join:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      "the table side must never shuffle for the tombstone mask")
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"hive pruning must survive the tombstone fold:\n${plan.take(2000)}")
    assert(q.as[Long].collect().toSet == (0L until 100L)
      .filter(i => i % 4 == 1 && i != 5L).toSet)
  }

  test("semantic decontamination broadcasts the bench side against the train scan") {
    // the 100 TB claim: the train corpus is never shuffled for the pair
    // join — the (tiny) assigned bench side arrives as a broadcast, so
    // the contamination pass is one map-side pipeline over train
    val mem = Corpus.memories(spark, sf())
    val cent = graft.ann.Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val plan = graft.dedup.SemDedup.semanticContamination(
        mem.filter(col("id") % 20 =!= 3), mem.filter(col("id") % 20 === 3),
        cent, eps = 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench side should broadcast into the cell join:\n${plan.take(2000)}")
  }

  test("OPQ rotation stays a map-only projection fused into codegen") {
    // rotate is a literal array gather — over a plain scan it must be one
    // codegen'd Project with no exchange and no join (AQE off so the
    // physical tree is printed, the rawPlan discipline)
    val perm = (0 until 64).reverse // any fixed permutation: plan-shape only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val s = try spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(graft.ann.Pq.rotate(col("embedding"), perm).as("r"))
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the "*(1)" prefix IS the whole-stage-codegen stage marker in the
    // compact plan string (the spelled-out node name only appears in the
    // tree dump)
    assert(s.contains("*(1) Project"),
      s"rotation should fuse into codegen stage 1:\n${s.take(1500)}")
    assert(!s.contains("Exchange"), s"rotation added an exchange:\n${s.take(1500)}")
  }

  test("BM25 scoring plans one pruned postings scan and never opens doclens") {
    // the dl-in-postings layout's whole point: scoring is a single
    // partition-pruned postings scan + a broadcast of |query| term rows.
    // A regression that re-introduces the corpus-sized doclens join (the
    // one shuffle this layout removed) must fail here, not on a cluster
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/audit_bm25_scores"
    graft.sources.Store.deleteRecursive(path)
    graft.search.BM25Index.build(
      Seq((1L, "dup merge window"), (2L, "spark window agg")).toDF("id", "text"),
      path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.search.BM25Index
      .scores(spark, path, Seq("dup", "window"))
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.count(_.contains("postings")) == 1,
      s"expected exactly one postings scan:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("doclens")),
      s"doclens must never be opened by the query path:\n${scans.mkString("\n")}")
    val postingsScan = scans.find(_.contains("postings")).get
    assert(postingsScan.contains("PartitionFilters: [") &&
      postingsScan.contains("pb"),
      s"postings scan must prune pb dirs at planning time:\n$postingsScan")
    assert(plan.contains("BroadcastHashJoin"),
      "the query's term rows must broadcast into the postings scan")
  }

  test("index-backed hybrid: pruned postings scan, probed cell dirs, no corpus-wide vector scan") {
    // the 100 TB query-path claim behind searchIndexed: the BM25 leg is
    // ONE pb-pruned postings scan (never doclens), the vector leg reads
    // only the nprobe probed cell dirs of the assignments table — neither
    // leg may regress to a full corpus scan of its index. Audited with the
    // extra rank signals OFF: with any active, fuseContribs eagerly
    // checkpoints the candidate pool (by design) and the leg scans vanish
    // behind an RDDScan — the legs are identical code either way
    val bm25Path = "/root/repo/target/tmp/audit_hyb_bm25"
    val ivfPath = "/root/repo/target/tmp/audit_hyb_ivf"
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
    val mem = Corpus.memories(spark, sf())
    graft.search.BM25Index.build(mem, bm25Path)
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    val p = Queries.hybridParams(spark, sf()).copy(
      recencyWeight = 0.0, feedbackWeight = 0.0, confidenceWeight = 0.0,
      confidenceProfiles = Nil)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (plan, poolPlan) = try {
      val full = graft.search.HybridSearch
        .searchIndexed(spark, bm25Path, ivfPath, mem, None, p)
        .queryExecution.executedPlan.toString
      // the vector leg's pool is eagerly checkpointed (one pruned scan
      // serves the escalation check AND the leg — r18), which truncates
      // its lineage out of the final plan; its scan shape is pinned on
      // the pool-construction frame directly (the indexedPool precedent)
      val pool = graft.search.HybridSearch
        .indexedVecPool(spark, ivfPath, mem, p, np = 2, fromRank = 0)
        .queryExecution.executedPlan.toString
      (full, pool)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    val postings = scans.filter(_.contains("postings"))
    assert(postings.size == 1 &&
      postings.head.contains("PartitionFilters: [") && postings.head.contains("pb"),
      s"BM25 leg must be one pb-pruned postings scan:\n${postings.mkString("\n")}")
    assert(!scans.exists(_.contains("doclens")),
      s"doclens must never be opened by the query path:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("assignments")),
      "the vector pool must ride its checkpoint — a live assignments scan " +
        s"in the final plan means the pool executes twice:\n${scans.mkString("\n")}")
    val poolScans = poolPlan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    val asg = poolScans.filter(_.contains("assignments"))
    assert(asg.nonEmpty && asg.forall(s =>
      s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
      s"vector leg must prune to the probed cell dirs:\n${asg.mkString("\n")}")
    assert(poolScans.filterNot(_.contains("assignments"))
      .forall(!_.contains("embedding:array")),
      "the pool's corpus join must not read the vector column:\n" +
        poolScans.mkString("\n"))
  }

  test("shared-plan batch search: ONE postings scan and ONE probed-cell scan for N queries") {
    // the r12 verdict's batch-shape claim: N homogeneous queries must not
    // cost N pruned postings scans — the shared plan joins one scan
    // against a broadcast (qid, term) table and one unioned probe read
    val bm25Path = "/root/repo/target/tmp/audit_batch_bm25"
    val ivfPath = "/root/repo/target/tmp/audit_batch_ivf"
    Seq(bm25Path, ivfPath).foreach(graft.sources.Store.deleteRecursive)
    val mem = Corpus.memories(spark, sf())
    graft.search.BM25Index.build(mem, bm25Path)
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    val p0 = Queries.hybridParams(spark, sf()).copy(
      recencyWeight = 0.0, feedbackWeight = 0.0, confidenceWeight = 0.0,
      confidenceProfiles = Nil)
    val qs = Seq(p0, p0.copy(queryVec = Queries.queryVec(spark, sf(), 1)),
      p0.copy(queryVec = Queries.queryVec(spark, sf(), 2)))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (plan, poolPlan) = try {
      val full = graft.search.HybridSearch
        .batchSearchIndexed(spark, bm25Path, ivfPath, mem, None, qs)
        .queryExecution.executedPlan.toString
      // the shared vector pool is eagerly checkpointed (one pruned scan
      // serves the per-qid escalation count AND the leg — r18), so its
      // scan shape is pinned on the probed-batch frame directly
      val s2 = spark
      import s2.implicits._
      val qvecs = qs.zipWithIndex.map { case (q, i) => (i, q.queryVec) }
        .toDF("qid", "qv")
      val pool = graft.ann.IvfIndex
        .probedCandidatesBatch(spark, ivfPath, qvecs, nprobe = 2)
        .queryExecution.executedPlan.toString
      (full, pool)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    val postings = scans.filter(_.contains("postings"))
    assert(postings.size == 1,
      s"N=3 queries must share ONE postings scan:\n${postings.mkString("\n")}")
    assert(!scans.exists(_.contains("assignments")),
      "the shared vector pool must ride its checkpoint — a live " +
        s"assignments scan means it executes twice:\n${scans.mkString("\n")}")
    val asg = poolPlan.linesIterator
      .filter(_.contains("FileScan parquet")).filter(_.contains("assignments")).toSeq
    assert(asg.size == 1 && asg.head.contains("PartitionFilters: [") &&
      asg.head.contains("ivf_cell"),
      s"N=3 queries must share ONE pruned probe read:\n${asg.mkString("\n")}")
  }

  test("index-backed ingest gates: probed cell dirs only, never a corpus embedding scan") {
    // the write-path gates (D1 novelty per add, D8 smart-import per batch)
    // must probe the index the engine already maintains — at 100 TB an
    // ingest that re-scans the corpus' embeddings per add is the scale
    // killer the persisted IVF index exists to prevent
    val ivfPath = "/root/repo/target/tmp/audit_gate_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    val mem = Corpus.memories(spark, sf())
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // novelty: the whole plan reads ONLY the index (probed assignments
      // dirs) — no corpus table at all
      val novPlan = graft.search.VectorSearch
        .noveltyIndexed(spark, ivfPath, Queries.queryVec(spark, sf()))
        .queryExecution.executedPlan.toString
      val novScans = novPlan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      assert(novScans.nonEmpty && novScans.forall(_.contains("assignments")),
        s"noveltyIndexed may read only the assignments table:\n${novScans.mkString("\n")}")
      assert(novScans.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"noveltyIndexed must prune to the probed cell dirs:\n${novScans.mkString("\n")}")
      // smart-import: the batch's best matches come from the pruned index
      // scan; the EXISTING corpus contributes metadata only (its embedding
      // column is never read — the one corpus embedding scan is the
      // incoming batch itself, which IS the query input)
      val incoming = mem.filter(col("id") % 2 === 1)
        .select((col("id") + 10000).as("id"), col("embedding"), col("created_at"))
      val existing = mem.filter(col("id") % 2 === 0)
      val siPlan = graft.dedup.Dedup
        .smartImportActionsIndexed(spark, incoming, existing, ivfPath)
        .queryExecution.executedPlan.toString
      val siScans = siPlan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val asg = siScans.filter(_.contains("assignments"))
      assert(asg.nonEmpty && asg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"smart-import's candidate read must prune to the probed dirs:\n${asg.mkString("\n")}")
      val corpusEmbScans = siScans.filterNot(s =>
        s.contains("assignments") || s.contains("centroids"))
        .filter(_.contains("embedding"))
      assert(corpusEmbScans.size <= 1,
        "the only corpus embedding read may be the incoming batch itself " +
          s"(the existing store's embeddings come from the index):\n${corpusEmbScans.mkString("\n")}")
      // auto-link: candidates AND their ids come from the index alone —
      // the pre-add store is not scanned at all, even for metadata
      val alPlan = graft.ops.Mutations
        .autoLinkIndexed(spark, ivfPath, mem.limit(5).select("id", "embedding"))
        .queryExecution.executedPlan.toString
      val alScans = alPlan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val alAsg = alScans.filter(_.contains("assignments"))
      assert(alAsg.nonEmpty && alAsg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"auto-link's candidate read must prune to the probed dirs:\n${alAsg.mkString("\n")}")
      assert(alScans.filterNot(s => s.contains("assignments")).size <= 1,
        "auto-link may read only the new batch besides the index:\n" +
          alScans.filterNot(_.contains("assignments")).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("indexed MaxSim rerank: probed cell dirs for the pool, corpus read without vectors") {
    // the rerank's vector leg must come from the pruned index scan; the
    // corpus contributes text + visibility ONLY — at 100 TB re-scanning
    // the corpus' embedding column for a 20-candidate rerank is the same
    // scale killer the ingest-gate pin guards against
    val ivfPath = "/root/repo/target/tmp/audit_li_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    val mem = Corpus.memories(spark, sf())
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.search.LateInteraction
        .indexedPool(spark, ivfPath, mem, Queries.QueryTokens.mkString(" "),
          candidates = 20, nprobe = 2, dim = 64)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val asg = scans.filter(_.contains("assignments"))
      assert(asg.nonEmpty && asg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"the pool read must prune to the probed cell dirs:\n${asg.mkString("\n")}")
      val nonIndex = scans.filterNot(s =>
        s.contains("assignments") || s.contains("centroids"))
      assert(nonIndex.forall(!_.contains("embedding:array")),
        "corpus-side scans must not read the vector column (the pool's " +
          s"scores come from the index):\n${nonIndex.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("indexed MaxP: one probed-cell scan, no passage re-embed") {
    // the indexed passage leg's whole point (r14 next-round #3): the
    // query path reads the PASSAGE INDEX alone — probed cell dirs pruned
    // at planning time, no pages scan, no per-passage HashEmbed in the
    // plan (the brute maxP re-embeds every passage per query; a
    // regression back to that shape must fail here, not on a cluster)
    val path = "/root/repo/target/tmp/audit_passage_ivf"
    graft.sources.Store.deleteRecursive(path)
    graft.search.Passage.buildIndex(Queries.c4Pages(spark, sf()), path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.search.Passage
        .maxPIndexed(spark, path, Queries.queryVec(spark, sf()), k = 10)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val asg = scans.filter(_.contains("assignments"))
      assert(asg.nonEmpty && asg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"the passage read must prune to the probed cell dirs:\n${asg.mkString("\n")}")
      assert(scans.forall(s =>
        s.contains("assignments") || s.contains("centroids")),
        s"the query path may read nothing but the index:\n${scans.mkString("\n")}")
      assert(!plan.contains("hash_embed"),
        "the indexed leg must score stored embeddings, never re-embed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("indexed timeline: ONE probed scan serves every variant, no vector read") {
    // the variant fan-out must NOT multiply scans: both query variants
    // ride one probedCandidatesBatch pass (a single pruned assignments
    // scan), and the corpus contributes text/date/visibility only — the
    // embedding column is never read (the scores come from the index)
    val ivfPath = "/root/repo/target/tmp/audit_o3_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    val mem = Corpus.memories(spark, sf())
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ops.Presentation
        .timelineIndexed(spark, ivfPath, mem,
          Seq(Queries.queryVec(spark, sf(), 0), Queries.queryVec(spark, sf(), 1)))
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val asg = scans.filter(_.contains("assignments"))
      assert(asg.size == 1, s"both variants must share ONE probed scan:\n${asg.mkString("\n")}")
      assert(asg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"the shared scan must prune to the probed dirs:\n${asg.mkString("\n")}")
      val corpusScans = scans.filterNot(s =>
        s.contains("assignments") || s.contains("centroids"))
      assert(corpusScans.forall(!_.contains("embedding:array")),
        "corpus-side scans must not read the vector column:\n" +
          corpusScans.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("indexed evidence packet: pruned probed scan, no vector read, no re-embed") {
    // the packet's candidate stage must read the probed cell dirs only;
    // the corpus contributes source/dates/flags by id-join — the embedding
    // column is never read and nothing is re-embedded at query time
    val ivfPath = "/root/repo/target/tmp/audit_o4_ivf"
    graft.sources.Store.deleteRecursive(ivfPath)
    val mem = Corpus.memories(spark, sf())
    graft.ann.IvfIndex.build(mem, Tables.embeddings(spark, sf()), ivfPath)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ops.Presentation
        .evidenceHitsIndexed(spark, ivfPath, mem,
          Queries.queryVec(spark, sf()), k = 20, nprobe = 2)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
      val asg = scans.filter(_.contains("assignments"))
      assert(asg.size == 1, s"ONE probed scan:\n${asg.mkString("\n")}")
      assert(asg.forall(s =>
        s.contains("PartitionFilters: [") && s.contains("ivf_cell")),
        s"the probed scan must prune to the probed dirs:\n${asg.mkString("\n")}")
      val corpusScans = scans.filterNot(s =>
        s.contains("assignments") || s.contains("centroids"))
      assert(corpusScans.nonEmpty && corpusScans.forall(!_.contains("embedding:array")),
        "corpus-side scans must not read the vector column:\n" +
          corpusScans.mkString("\n"))
      assert(!plan.contains("hash_embed"),
        "the indexed packet must score stored embeddings, never re-embed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("retrainCells' member read prunes to the flagged cells' partitions") {
    // the claim retraining is O(flagged members), never O(corpus), rests
    // on this scan: `ivf_cell IN (flagged)` must prune at PLANNING time
    // on the cell-partitioned assignments table — a regression to a
    // post-scan filter would read every cell of a 100 TB index to retrain
    // one drifted cell
    val s = spark
    import s.implicits._
    val path = "/root/repo/target/tmp/audit_ivf_retrain"
    graft.sources.Store.deleteRecursive(path)
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    graft.ann.IvfIndex.buildWithCentroids(
      Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("id", "embedding"),
      Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("label", "centroid"),
      path)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.ann.IvfIndex
      .flaggedMembers(spark, path, Seq(0))
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scan = plan.linesIterator
      .filter(_.contains("FileScan parquet")).mkString("\n")
    assert(scan.contains("PartitionFilters: [") && scan.contains("ivf_cell"),
      s"member read must prune flagged-cell dirs at planning time:\n$scan")
  }

  test("persisted two-level probe prunes assignments on BOTH quantizer keys") {
    // the MaxNlist growth path's scale claim: at 10^11 rows the probe
    // reads nprobe2 of ~1.7e7 (cell, sub-cell) dirs — that is only true
    // if BOTH keys reach the scan as PartitionFilters; a regression to a
    // post-scan filter on l2_cell would read whole level-1 cells
    val path = "/root/repo/target/tmp/audit_2lvl"
    graft.sources.Store.deleteRecursive(path)
    graft.ann.TwoLevelIvf.buildIndex(
      Corpus.memories(spark, sf()), Tables.embeddings(spark, sf()),
      path, fanout = 4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.ann.TwoLevelIvf
      .topKIndexed(spark, path, Queries.queryVec(spark, sf()), k = 10)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("assignments")),
      s"the probe frame may read only the assignments table:\n${scans.mkString("\n")}")
    assert(scans.forall(s => s.contains("PartitionFilters: [") &&
      s.contains("ivf_cell") && s.contains("l2_cell")),
      s"two-level probe must prune on both keys:\n${scans.mkString("\n")}")
    graft.sources.Store.deleteRecursive(path)
  }

  test("IVF assignment argmax partially aggregates before the shuffle, no rank window") {
    // at nlist=4096 a rank window over corpus x nlist scored rows shuffles
    // every scored row; max_by's partial (map-side) aggregate collapses to
    // one row per id first. Pin: two aggregate stages around one exchange,
    // zero Window/Sort operators
    val s = spark
    import s.implicits._
    val rows = (0L until 100L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("id", "embedding")
    val cents = Seq((0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 1f, 0f, 0f)))
      .toDF("label", "centroid")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.ann.Ann.assignWithSim(rows, cents)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(!plan.contains("Window"),
      s"argmax must not plan a rank window:\n${plan.take(1500)}")
    assert(plan.contains("partial_max_by"),
      s"expected a map-side partial max_by stage:\n${plan.take(1500)}")
    assert(plan.contains("max_by") && plan.contains("Exchange hashpartitioning"),
      s"expected final max_by after one hash exchange:\n${plan.take(1500)}")
  }

  test("curation profile: Opaque barrier keeps the heavy trees above the fan-out exchange, evaluated once") {
    // the r17 Opaque change's pin (guide §4.4 barrier for built-in trees):
    // without the barrier, Catalyst pushes the kept-filter (which embeds
    // the langId/quality trees once inlined) BELOW the CPU-fan-out
    // repartition onto the single-split documents scan — the whole
    // predicate serializes on one core — and CollapseProject duplicates
    // the trees into the filter AND the projection above it. Pin both
    // properties on the curate() "kept" shape.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.text.Curation
      .profile(graft.core.Tables.documents(spark, sf())
        .select(col("doc_id").as("id"), col("text")))
      .filter(col("lang") === "en" && col("quality") >= 0.5 && col("n_ws") >= 10)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val lines = plan.linesIterator.toSeq
    // (a) single evaluation: the langId argmax (sort_array over the
    // stopword-score structs) lives in exactly ONE operator — duplication
    // into a pushed filter would make it two
    val heavyOps = lines.count(_.contains("sort_array"))
    assert(heavyOps == 1,
      s"langId tree must appear in exactly one operator, found $heavyOps:\n${plan.take(3000)}")
    // (b) plan strings print parents first, so the barrier's shape reads
    // top-down as: Filter (on the PROJECTED lang/quality/n_ws attributes)
    // → Project (the one heavy tree) → Exchange (fan-out) → scan. A
    // regression pushes the filter below the exchange, flipping the order
    val fIdx = lines.indexWhere(_.contains("Filter"))
    val pIdx = lines.indexWhere(_.contains("sort_array"))
    val eIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(fIdx >= 0 && pIdx >= 0 && eIdx >= 0 && fIdx < pIdx && pIdx < eIdx,
      s"expected Filter above the heavy Project above the fan-out exchange " +
        s"(filter@$fIdx, project@$pIdx, exchange@$eIdx):\n${plan.take(3000)}")
  }

  test("flagship hybrid search stays within bounded exchanges") {
    val plan = planOf("r4_hybrid_rrf")
    // oversample-bounded rank windows: every window in the fused plan runs
    // over pre-reduced candidate sets, so a single-partition global sort of
    // the corpus must never appear before the final <=k take
    val exchanges = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(exchanges <= 6,
      s"hybrid plan has $exchanges single-partition exchanges (bounded merges expected)")
  }
}
