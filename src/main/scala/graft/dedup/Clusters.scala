package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** D4: similar-memory clustering — connected components over duplicate pairs,
  * then the reference's "tighten" pass that drops members similar to fewer
  * than half their cluster co-members (memory_engine.py:2274-2342).
  *
  * Connected components run as iterative min-label propagation over the pair
  * edge list — each round is one join+aggregate, converging in O(diameter)
  * rounds with a driver-side changed-count check (the same scalar-only
  * pattern as [[graft.search.GraphSearch.ppr]]). Dup clusters are small and
  * shallow, so this terminates in a handful of rounds at any corpus size.
  */
object Clusters {

  /** Edge-count bound under which components run as a driver-side
    * union-find instead of the iterative DataFrame loop. */
  val MaxDriverEdges: Long = 2000000L

  /** Size-routed connected components (same switch pattern as
    * [[Dedup.topNeighborsAuto]]): the near-dup pair graph is tiny relative
    * to the corpus by construction — bounded top-5 neighbors over the
    * ≥threshold tail — so up to [[MaxDriverEdges]] edges the list rides ONE
    * collect into an exact O(E·α) union-find (the iterative loop spends
    * ~10 scheduler round-trips per propagation round on a graph this
    * small); past the bound, the distributed min-label loop runs. Both
    * paths label each node with the minimum reachable id (pinned equal by
    * DedupSpec). */
  def connectedComponentsAuto(pairs: DataFrame,
                              maxDriverEdges: Long = MaxDriverEdges): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val spark0 = pairs.sparkSession
    import spark0.implicits._
    // take(bound+1) instead of count()-then-collect(): one bounded fetch of
    // primitive tuples (no GenericRow overhead), and the length doubles as
    // the over-bound test — > bound rows means route distributed. A bound
    // at or beyond Int.MaxValue can't ride a driver array anyway: clamp so
    // the +1 can't overflow (take(negative)) or wrap the routing test.
    val bound = math.min(maxDriverEdges, Int.MaxValue - 2L).toInt
    val edges = p.as[(Long, Long)].take(bound + 1)
    if (edges.length > bound) return connectedComponents(p)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val g = parent.getOrElse(parent(x), parent(x)) // path halving
        parent(x) = g; x = g
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are min-id already (unions always point larger -> smaller)
    val rows = parent.keys.toSeq.sorted.map(x => (x, find(x)))
    rows.toDF("id", "component")
  }

  /** Incremental connected components: fold a BATCH of new edges into an
    * existing (id, component) labeling without touching the old edge set —
    * the O(batch) maintenance form of CC (the `ann_ivf_indexed` refresh ≡
    * rebuild discipline applied to the graph tier; at 100 TB the full
    * edge scan is the cost you run once, not per ingest).
    *
    * Correctness argument: if `labels` is a components fixpoint of its
    * edge set (component = min reachable id), then every new edge
    * connects two WHOLE old components, so merging at component level is
    * exact: (1) map each new edge endpoint to its old component (ids new
    * to the graph label themselves); (2) union-find over the tiny
    * component-level edge list ON THE DRIVER — bounded by 2·|batch|
    * nodes, and the loud `require` keeps the bound honest; (3) ONE
    * broadcast relabel join over the label table — map-only, no shuffle
    * of the corpus, no iterative loop. Min-id labels are preserved
    * because unions always point larger roots at smaller ones.
    *
    * Output: (id, component) over old ∪ batch ids. */
  def connectedComponentsIncremental(labels: DataFrame, newPairs: DataFrame,
                                     maxBatchEdges: Long = MaxDriverEdges): DataFrame = {
    val spark0 = labels.sparkSession
    import spark0.implicits._
    val lab = labels.select(col("id"), col("component"))
      .localCheckpoint(true) // feeds the endpoint lookups and the relabel
    // endpoint -> old component; unseen endpoints are their own component
    val compEdges = newPairs.select(col("id_a"), col("id_b"))
      .join(lab.select(col("id").as("id_a"), col("component").as("_ca")),
        Seq("id_a"), "left")
      .join(lab.select(col("id").as("id_b"), col("component").as("_cb")),
        Seq("id_b"), "left")
      .select(coalesce(col("_ca"), col("id_a")).as("ca"),
        coalesce(col("_cb"), col("id_b")).as("cb"))
      .filter(col("ca") =!= col("cb")).distinct()
    val bound = math.min(maxBatchEdges, Int.MaxValue - 2L).toInt
    val merges = compEdges.as[(Long, Long)].take(bound + 1)
    require(merges.length <= bound,
      s"incremental CC batch produced > $bound component merges — run the " +
        "full recompute instead (a silent truncation would mislabel)")
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val g = parent.getOrElse(parent(x), parent(x))
        parent(x) = g; x = g
      }
      x
    }
    merges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val remap = parent.keys.toSeq.sorted.map(c => (c, find(c))).filter(p => p._1 != p._2)
    // ids appearing only in the batch enter the label table labeling
    // themselves, then everything relabels through the broadcast merge map
    val newNodes = newPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      .join(lab, Seq("id"), "left_anti")
    val all = lab.unionByName(newNodes.select(col("id"), col("id").as("component")))
    if (remap.isEmpty) all
    else all
      .join(broadcast(remap.toDF("component", "_newc")), Seq("component"), "left")
      .select(col("id"), coalesce(col("_newc"), col("component")).as("component"))
  }

  /** Connected components of an undirected edge list (id_a, id_b):
    * returns (id, component) where component = min id reachable. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // localCheckpoint (eager) truncates the logical plan each round —
    // without it the iterated lineage nests exponentially and the driver
    // chokes on plan re-optimization long before any executor works.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    // seed with the first propagation for free: component0 = min(id, min
    // neighbor) — one groupBy on the already-checkpointed edges replaces a
    // full propagate+jump+checkpoint round
    var labels = edges.groupBy("src")
      .agg(min("dst").as("_mn"))
      .select(col("src").as("id"), least(col("src"), col("_mn")).as("component"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // (1) min-label propagation over edges
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("component").as("ncomp"))
      val prop = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
      // (2) pointer jumping: component := component(component) — path halving
      // turns O(diameter) convergence into O(log diameter)
      val next = prop.as("a")
        .join(prop.select(col("id").as("cid"), col("component").as("ccomp")).as("b"),
          col("a.component") === col("b.cid"), "left")
        .select(col("a.id").as("id"), col("a._old").as("_old"),
          least(col("a.component"), coalesce(col("ccomp"), col("a.component"))).as("component"))
        .localCheckpoint()
      // convergence check is a filter over the just-materialized blocks —
      // the old label travels inside the row, so no per-round join job
      val changed = next.filter(col("component") =!= col("_old")).limit(1).count()
      labels = next.select("id", "component")
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii '14 "Connected
    * Components in MapReduce and Beyond", public) — the third CC
    * formulation next to the driver union-find (≤ 2M edges) and the
    * min-label + pointer-jumping loop, and the one with the strongest
    * massive-graph guarantee: O(log² n) rounds with per-round work that is
    * ONE neighborhood-min aggregation + one equi-join, no pointer-chase
    * self-join of the full label table. Each round rewrites the EDGE SET:
    * large-star connects every neighbor larger than the center to the
    * neighborhood min; small-star connects the center and its smaller
    * neighbors to that min; the unique fixpoint is a star per component
    * centered on its minimum id, read off as (id, component).
    *
    * Convergence is detected by an order-free edge-set signature
    * (count + sum of per-edge xxhash64) — two scalars per round, no
    * set-difference join — and the loop FAILS LOUDLY if the fixpoint is
    * not reached within `maxRounds` (the kCore lesson: never silently
    * return a non-converged superset). Rounds are flattened through eager
    * localCheckpoints like every other iterative loop here. */
  def connectedComponentsStars(pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    var e = canon(pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      .localCheckpoint(true)
    val vertices = e.select(col("a").as("id")).unionAll(e.select(col("b")))
      .distinct().localCheckpoint(true)
    // per-edge hash reduced mod a prime before the sum so the order-free
    // signature sum cannot overflow ANSI long arithmetic below ~9e9 edges;
    // the third component xors the FULL 64-bit hashes — two independent
    // order-free aggregates over 64-bit values make an undetected
    // same-signature collision between different edge sets practically
    // impossible (≈2⁻⁹⁴), closing the silent-wrong-fixpoint hole a
    // sum-only signature left open
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)).as("c"),
        sum(pmod(xxhash64(col("a"), col("b")), lit(1000000007L))).as("h"),
        expr("bit_xor(xxhash64(a, b))").as("x")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var sig = signature(e)
    var stable = sig._1 == 0 // an empty edge set IS the fixpoint
    var rounds = 0
    while (!stable && rounds < maxRounds) {
      // large-star: per center v over BOTH edge directions, m = min(Γ⁺(v));
      // every strictly larger neighbor re-attaches to m
      val adj = e.select(col("a").as("v"), col("b").as("u"))
        .unionAll(e.select(col("b").as("v"), col("a").as("u")))
      val mOf = adj.groupBy("v").agg(min("u").as("_mn"))
        .select(col("v"), least(col("v"), col("_mn")).as("m"))
      val ls = canon(adj.join(mOf, "v").filter(col("u") > col("v"))
          .select(col("m").as("a"), col("u").as("b")))
        .localCheckpoint(true)
      // small-star on the canonical (a < b) set: center = b, smaller
      // neighbors = a; both the center and each smaller neighbor
      // re-attach to the min smaller neighbor
      val mOf2 = ls.groupBy(col("b").as("_v")).agg(min("a").as("_mn"))
      val ss = canon(
        ls.select(col("a").as("_sa"), col("b").as("_v"))
          .join(mOf2, "_v")
          .select(col("_mn").as("a"), col("_sa").as("b"))
          .unionAll(mOf2.select(col("_mn").as("a"), col("_v").as("b"))))
      e = ss.localCheckpoint(true)
      val s2 = signature(e)
      stable = s2 == sig
      sig = s2
      rounds += 1
    }
    require(stable,
      s"connectedComponentsStars did not reach its fixpoint within " +
        s"$maxRounds alternating rounds — raise maxRounds (the edge set " +
        "was still changing; a silent cap would return wrong components)")
    // fixpoint = stars: every non-min vertex appears exactly once as b,
    // attached to its component min a; minima label themselves
    vertices
      .join(e.select(col("b").as("id"), col("a").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Reference cluster semantics: components over `pairs`, tighten by
    * majority-similarity, drop clusters below `minClusterSize`. `pairs` must
    * carry (id_a, id_b, similarity) from [[Dedup.findDuplicates]].
    * Output: (cluster, id) with cluster = min surviving member id. */
  def similarClusters(pairs0: DataFrame, threshold: Double,
                      minClusterSize: Int = 2): DataFrame = {
    // the pair set feeds components, the sym lookup, AND the tighten count —
    // materialize once instead of re-running the quadratic scoring join 3x
    val pairs = pairs0.localCheckpoint()
    val comp = connectedComponentsAuto(pairs)
    val sized = comp.groupBy("component").agg(count(lit(1)).as("csize"))
    val members = comp.join(sized.filter(col("csize") >= minClusterSize), "component")
    // sim lookup is symmetric; count co-members with sim >= threshold
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("other"), col("similarity"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("other"), col("similarity")))
    val simCount = members
      .join(sym, Seq("id"), "left")
      .join(members.select(col("id").as("other"), col("component").as("ocomp")),
        Seq("other"), "left")
      .groupBy(col("id"), col("component"), col("csize"))
      .agg(sum(when(col("ocomp") === col("component") && col("similarity") >= threshold, 1)
        .otherwise(0)).as("similar_count"))
    val tightened = simCount
      .filter(col("similar_count") >= (col("csize") - 1) / 2.0)
    val surviving = tightened.groupBy("component")
      .agg(count(lit(1)).as("fsize"), min("id").as("cluster"))
      .filter(col("fsize") >= minClusterSize)
    tightened.join(surviving, "component")
      .select(col("cluster"), col("id"))
      .orderBy("cluster", "id")
  }
}
