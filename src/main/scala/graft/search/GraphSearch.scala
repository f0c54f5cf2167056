package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions.roundScore

/** R8-R12: graph expansion via truncated Personalized PageRank over the
  * `related_to` link graph (reference memory_engine.py:1490-1723).
  *
  * Spark shape: edges are an exploded DataFrame; each PPR iteration is one
  * join+aggregate (propagation) unioned with a teleport/dangling term, with
  * an eager `localCheckpoint` per round to keep the iterated plan flat. The
  * only driver-side values are single-row aggregates (dangling mass, max
  * scores, a branch count), which is the same pattern AQE itself uses; the
  * per-node state never leaves the cluster.
  *
  * Constants (memory_engine.py:44-52): alpha=0.85, 3 iterations, relative
  * cutoff 0.05, 2 reserved graph-only slots, support/inject capped at
  * 0.33 * top_rrf.
  */
object GraphSearch {

  val Alpha = 0.85
  val MaxIters = 3
  val MinRelative = 0.05
  val ReservedSlots = 2
  val SupportCap = 0.33

  /** Session conf key: when "true", the iterative loops ([[ppr]],
    * [[pageRank]], [[kCore]]) materialize each round through a RELIABLE
    * checkpoint (spark.sparkContext.setCheckpointDir required) instead of
    * localCheckpoint. Local blocks die with their executor; on a real
    * cluster a long loop should pay the checkpoint-dir write to survive
    * executor loss. Default off — at local[32] the local form wins
    * (GraphSearchSpec exercises both). */
  val ReliableCheckpointConf = "graft.graph.reliableCheckpoint"

  /** Eager per-round materialization honoring [[ReliableCheckpointConf]]. */
  private def roundCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ReliableCheckpointConf, "false").toBoolean)
      df.checkpoint()
    else df.localCheckpoint(true)

  /** Landmark BFS: exact hop distances from a small fixed set of landmark
    * nodes, out to `maxHops` (the landmark/sketch family of shortest-path
    * estimation on massive graphs — Potamias et al. '09 "Fast Shortest
    * Path Distance Estimation in Large Networks", public: d(u,v) is
    * bounded by min over landmarks of d(u,l)+d(l,v), so one BFS table per
    * landmark answers distance queries with no per-query traversal).
    *
    * The loop is level-synchronous frontier expansion — per hop ONE
    * edge⋈frontier join + an anti-join against the settled set, both
    * checkpointed like every iterative loop here; a node's first
    * discovery IS its exact distance, so no min-relaxation rounds are
    * needed. Frontiers shrink monotonically and the loop early-outs on an
    * empty frontier (result identical to running all `maxHops` rounds —
    * the oracle unrolls depth-bounded recursion and takes min(dist)).
    *
    * Output: (landmark, id, dist ≤ maxHops) for every reached node,
    * including (l, l, 0). */
  def landmarkDistances(memories: DataFrame, landmarks: Seq[Long],
                        maxHops: Int = 4): DataFrame = {
    require(landmarks.nonEmpty, "landmarkDistances needs at least one landmark")
    val spark = memories.sparkSession
    import spark.implicits._
    val e = edges(memories).localCheckpoint(true)
    var settled = landmarks.map(l => (l, l, 0))
      .toDF("landmark", "id", "dist").localCheckpoint(true)
    var frontier = settled
    var hop = 1
    while (hop <= maxHops && frontier.limit(1).count() > 0) {
      val next = roundCheckpoint(frontier
        .join(e, frontier("id") === e("src"))
        .select(col("landmark"), col("dst").as("id"), lit(hop).as("dist"))
        .distinct()
        .join(settled.select("landmark", "id"), Seq("landmark", "id"), "left_anti"))
      // settled stays a LAZY union of the per-hop checkpointed frontiers:
      // every member frame is already materialized, so the anti-join and
      // the final read cost one block scan per hop-frame — the former
      // per-hop roundCheckpoint(settled ∪ next) rewrote the ENTIRE settled
      // set every hop, an O(V·hops) materialization at graph scale for a
      // set that only ever grows by `next`.
      settled = settled.unionByName(next)
      frontier = next
      hop += 1
    }
    settled
  }

  /** R8: bidirectional edge list from inline links — (src, dst), self-edges
    * and dangling targets dropped, deduped (memory_engine.py:1490-1508). */
  def edges(memories: DataFrame, linkType: String = "related_to"): DataFrame =
    edgesImpl(memories, linkType, dropDangling = true)

  /** [[edges]] with the dangling-target semi-join optional: a caller that
    * immediately semi-joins BOTH endpoints against a subset of the memory
    * ids ([[visibleEdges]]) subsumes the dangling drop — vis ⊆ ids, so
    * (src, dst) survives (edges + endpoint filter) iff it survives
    * (raw links + endpoint filter). One membership join instead of two
    * per graph query (guide §2.4: remove joins the next filter implies). */
  private def edgesImpl(memories: DataFrame, linkType: String,
                        dropDangling: Boolean): DataFrame = {
    val raw = memories
      .select(col("id").as("src"), explode(col("links")).as("l"))
      .filter(col("l.link_type") === linkType && col("l.to_id") =!= col("src"))
      .select(col("src"), col("l.to_id").as("dst"))
    val fwd =
      if (!dropDangling) raw
      else raw
        .join(memories.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst") // re-fix column ORDER: the using-join moved dst first
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** R9: restrict edges to the visible subgraph — BOTH endpoints must be
    * visible, so out-of-scope nodes cannot act as transit bridges
    * (memory_engine.py:1510-1539). */
  def visibleEdges(memories: DataFrame, sourcePrefix: Option[String],
                   includeArchived: Boolean, linkType: String = "related_to"): DataFrame = {
    val vis = memories
      .filter(Filters.sourcePrefix(sourcePrefix) && Filters.notArchived(includeArchived))
      .select("id")
    // dropDangling=false: the dst semi-join below subsumes the dangling
    // drop (vis ⊆ memory ids) — see edgesImpl
    edgesImpl(memories, linkType, dropDangling = false)
      .join(vis.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(vis.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
  }

  /** R10: truncated PPR. `seeds` is (id, p) with p max-normalized; returns
    * (id, ppr) after `iters` iterations (memory_engine.py:1589-1613).
    *
    * Per iteration: new[n] = restart*p[n] + alpha*danglingMass*p[n]/pTotal
    * (teleport+dangling, seeds only) + sum over in-neighbors m of
    * alpha*old[m]/deg(m).
    */
  def ppr(edgesDf: DataFrame, seeds: DataFrame, iters: Int = MaxIters,
          alpha: Double = Alpha, pTotalKnown: Option[Double] = None): DataFrame = {
    val e = edgesDf.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "id")
    // Each node's out-degree TRAVELS WITH the score frame instead of being
    // re-joined per round: e3 carries the destination's degree (one build-
    // time join of two O(E) frames), seeds pick theirs up once, and the
    // propagation join rewrites (id, score, deg) -> (dst, c, deg_dst). The
    // per-round plan is then one join of the tiny frontier against the
    // persisted edge frame — AQE broadcasts the frontier side, so the O(E)
    // side is never shuffled inside the loop (profiled: the per-round
    // frontier⋈degree outer join was the graph family's dominant job count).
    val e3 = e
      .join(deg.select(col("id").as("dst"), col("deg").as("deg_dst")), Seq("dst"), "left")
      .select(col("src"), col("dst"), col("deg_dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s = seeds.join(deg, Seq("id"), "left")
      .select(col("id"), col("p"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pTotalRaw = pTotalKnown.getOrElse(s.agg(sum("p")).head().getDouble(0))
    val pTotal = if (pTotalRaw == 0.0) 1.0 else pTotalRaw
    val restart = 1.0 - alpha

    var cur = s.select(col("id"), col("p").as("score"), col("deg"))
    for (_ <- 1 to iters) {
      // dangling mass enters as a broadcast 1-row aggregate so each round is
      // ONE job (checkpoint materialization) rather than a separate `.head()`
      // round-trip per iteration
      val dang = cur.filter(col("deg").isNull)
        .agg(coalesce(sum("score"), lit(0.0)).as("dm"))
      val teleport = s.crossJoin(broadcast(dang)).select(
        col("id"),
        (lit(restart) * col("p") + lit(alpha) * col("dm") * col("p") / pTotal).as("c"),
        col("deg"))
      val prop = cur.filter(col("deg").isNotNull)
        .join(e3, col("id") === col("src"))
        .select(col("dst").as("id"), (lit(alpha) * col("score") / col("deg")).as("c"),
          col("deg_dst").as("deg"))
      val agged = teleport.unionAll(prop).groupBy("id")
        .agg(sum("c").as("score"), max("deg").as("deg"))
      // eager per-round checkpoint — the MEASURED optimum among three
      // shapes: one checkpoint after the loop re-executes each round's
      // subplan through the dangling broadcast (30% slower, round 3), and
      // lazy per-round persist + one final materialization ADDS jobs under
      // AQE (cache-build and broadcast materializations: r10 105 -> 118,
      // r12 85 -> 90 measured this round) — the straight eager checkpoint
      // stays the floor.
      cur = roundCheckpoint(agged)
    }
    // the eager checkpoint above makes `cur` lineage-free — the loop inputs
    // can be freed here instead of leaking for the session lifetime
    e.unpersist(); e3.unpersist(); s.unpersist()
    cur.select(col("id"), col("score").as("ppr"))
  }

  /** [[ppr]] for a BATCH of seed sets in one shared loop (the r13 verdict
    * #8 graph tail of the shared-plan batch search): `seeds` is
    * (qid, id, p) and `pTotals` a small (qid, pt) frame of the per-qid
    * seed-mass totals (the caller knows them driver-side, as the
    * single-query path does). The edge frame — the O(E) side — is
    * persisted ONCE and every round is ONE join of the combined
    * (qid, id, score) frontier against it: N queries cost one edge scan
    * per round, not N. Per-(qid, id) arithmetic is the single-query
    * formula verbatim (same operation tree, per-qid dangling mass joined
    * by qid instead of a 1-row broadcast), so per-qid output equals N
    * independent [[ppr]] runs — pinned by the `r15_batch_graph_indexed`
    * per-query-union oracle. Output: (qid, id, ppr). */
  def pprBatch(edgesDf: DataFrame, seeds: DataFrame, pTotals: DataFrame,
               iters: Int = MaxIters, alpha: Double = Alpha): DataFrame = {
    val e = edgesDf.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "id")
    val e3 = e
      .join(deg.select(col("id").as("dst"), col("deg").as("deg_dst")), Seq("dst"), "left")
      .select(col("src"), col("dst"), col("deg_dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s = seeds.join(deg, Seq("id"), "left")
      .join(broadcast(pTotals), "qid")
      .select(col("qid"), col("id"), col("p"), col("deg"), col("pt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val restart = 1.0 - alpha

    var cur = s.select(col("qid"), col("id"), col("p").as("score"), col("deg"))
    for (_ <- 1 to iters) {
      // per-qid dangling mass: the batch form of the 1-row broadcast —
      // a ≤|batch|-row aggregate joined back by qid (absent ⇒ 0.0)
      val dang = cur.filter(col("deg").isNull)
        .groupBy("qid").agg(coalesce(sum("score"), lit(0.0)).as("dm"))
      val teleport = s.join(broadcast(dang), Seq("qid"), "left").select(
        col("qid"), col("id"),
        (lit(restart) * col("p") +
          lit(alpha) * coalesce(col("dm"), lit(0.0)) * col("p") / col("pt")).as("c"),
        col("deg"))
      val prop = cur.filter(col("deg").isNotNull)
        .join(e3, col("id") === col("src"))
        .select(col("qid"), col("dst").as("id"),
          (lit(alpha) * col("score") / col("deg")).as("c"),
          col("deg_dst").as("deg"))
      val agged = teleport.unionAll(prop).groupBy("qid", "id")
        .agg(sum("c").as("score"), max("deg").as("deg"))
      cur = roundCheckpoint(agged)
    }
    e.unpersist(); e3.unpersist(); s.unpersist()
    cur.select(col("qid"), col("id"), col("score").as("ppr"))
  }

  /** Global (non-personalized) PageRank over the link graph — the corpus-
    * level companion to the per-query truncated [[ppr]]: a static authority
    * score per memory for analytics/ranking priors (Page et al. '99,
    * public). Per-node base form, damping 0.85, `iters` rounds:
    *
    *   pr_0(v) = 1;  pr_{k+1}(v) = 0.15 + 0.85 · Σ_{u→v} pr_k(u)/deg(u)
    *
    * evaluated entirely in integer micro-units with integral division
    * (contribution = pr div deg, damping = (85·sum) div 100), so every
    * per-node aggregation is an order-free BIGINT sum and the result is
    * bit-exact against the unrolled SQL oracle — no float-summation-order
    * hazard. Dangling nodes keep the base term only (the summation
    * formulation; no dangling-mass redistribution), matching the truncated
    * propagation the reference's graph layer uses.
    *
    * Scale shape: out-degree is joined onto the edge list ONCE (the
    * [[ppr]] degrees-travel-with-the-frontier lesson); each round is one
    * join of the score frame against the persisted (src, dst, deg) frame
    * plus a map-side-combined groupBy, flattened by an eager per-round
    * localCheckpoint exactly like the PPR loop's measured optimum. */
  def pageRank(memories: DataFrame, iters: Int = MaxIters): DataFrame = {
    val e = edges(memories).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
      .select("src", "dst", "deg")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = memories.select("id").persist(StorageLevel.MEMORY_AND_DISK)
    var pr = roundCheckpoint(nodes.withColumn("pr", lit(1000000L)))
    for (_ <- 1 to iters) {
      val inSum = pr.join(ed, pr("id") === ed("src"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      pr = roundCheckpoint(nodes.join(inSum, nodes("id") === inSum("dst"), "left")
        .select(nodes("id"),
          (lit(150000L) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("pr")))
    }
    e.unpersist(); ed.unpersist(); nodes.unpersist()
    pr.select(col("id"), round(col("pr").cast("double") / 1e6, 6).as("pagerank"))
  }

  /** Connected components of the link graph: (id, component, csize) for
    * EVERY memory — linkless nodes form singleton components labeled by
    * their own id. Labels follow the min-member-id convention of
    * [[graft.dedup.Clusters]], whose size-routed machinery (driver
    * union-find under the 2M-edge switch, distributed min-label iteration
    * beyond) does the work; this wrapper only derives the undirected pair
    * set from [[edges]] and restores the isolated nodes. The third graph
    * analytics surface beside per-query [[ppr]] and global [[pageRank]]. */
  def components(memories: DataFrame,
                 cc: DataFrame => DataFrame =
                   graft.dedup.Clusters.connectedComponentsAuto(_)): DataFrame = {
    val pairs = edges(memories).filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    val comp = cc(pairs)
    val full = memories.select("id").join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint(true) // feeds the size rollup and the final join
    val sz = full.groupBy("component").agg(count(lit(1)).as("csize"))
    full.join(sz, "component").select("id", "component", "csize")
  }

  /** Triangle census of an undirected pair graph — one row:
    * (n_nodes, n_edges, n_wedges, n_triangles, transitivity) with global
    * transitivity = 3·T / wedges (Newman '03, public; wedges = Σ_v
    * deg(v)·(deg(v)−1)/2). Works over ANY (id_a, id_b) pair frame — the
    * link graph via [[edges]], or a similarity pair set from
    * [[graft.dedup.Dedup]], where triangle density measures how clique-like
    * the near-dup neighborhoods are (tight clusters → high transitivity).
    *
    * Scale shape: the classic degree-ordered orientation (Chiba-Nishizeki /
    * Suri-Vassilvitskii "MR-ApproxCount" orientation, public) — each edge
    * points from its lower-(deg, id) endpoint to the higher, which bounds
    * every vertex's out-degree at O(√m), so the wedge self-join fans out
    * O(m^1.5) worst-case instead of Σ deg² on the raw adjacency (a
    * hub-skew blowup at corpus scale). Wedge closure is one equi-join back
    * against the canonical edge set; the census metrics are order-free
    * integer aggregates crossed as 1-row frames. */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val und = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("_db")), "b")
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
    val w1 = oriented.select(col("lo"), col("hi").as("_h1"))
    val w2 = oriented.select(col("lo"), col("hi").as("_h2"))
    val tri = w1.join(w2, "lo").filter(col("_h1") < col("_h2"))
      .join(und, least(col("_h1"), col("_h2")) === col("a") &&
        greatest(col("_h1"), col("_h2")) === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
    val out = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(nodes).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("transitivity"))
    // materialize the 1-row census eagerly so the loop inputs can be freed
    // here — otherwise each invocation leaks two cached frames for the
    // session lifetime (the verify/bench drivers run many queries per JVM)
    val materialized = out.localCheckpoint(true)
    und.unpersist(); deg.unpersist()
    materialized
  }

  /** k-core of an undirected pair graph (Seidman '83, public): the maximal
    * subgraph where every node has degree ≥ k, found by iterated peeling —
    * drop nodes with degree < k, recompute, repeat to the (unique)
    * fixpoint. Returns (id, core_deg) for the surviving nodes with their
    * in-core degree — the standard "dense neighborhood" extractor over a
    * similarity graph (near-dup nests, citation cores).
    *
    * Scale shape: each round is one degree aggregation + one semi-join of
    * the edge frame against the surviving nodes, flattened by an eager
    * localCheckpoint exactly like the PPR loop's measured optimum; the
    * loop exits when the edge count stops shrinking (a scalar per round).
    * The fixpoint is unique, so the result is independent of round
    * batching — the oracle reaches the same set by fixed unrolling. */
  def kCore(pairs: DataFrame, k: Int = 2, maxRounds: Int = 20): DataFrame = {
    var und = roundCheckpoint(pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    var prev = und.count()
    var rounds = 0
    var stable = prev == 0
    while (!stable && rounds < maxRounds) {
      val deg = und.select(col("a").as("v")).unionAll(und.select(col("b")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("v")
      val next = roundCheckpoint(und
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi"))
      val n = next.count()
      // an empty edge set IS the fixpoint (one more round would be a
      // no-op) — without the n == 0 arm a peel that empties exactly on
      // the last budgeted round would spuriously fail the require below
      stable = n == prev || n == 0
      prev = n
      und = next
      rounds += 1
    }
    // never silently cap: a superset of the true k-core (a peel that still
    // had work to do at maxRounds) is a WRONG answer, not a degraded one —
    // a 100× graph whose degeneracy-driven peel depth exceeds the budget
    // must fail loudly, not pass quietly
    require(stable,
      s"kCore did not reach the peel fixpoint within $maxRounds rounds " +
        s"($prev edges still shrinking) — raise maxRounds")
    und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("core_deg"))
      .select(col("v").as("id"), col("core_deg"))
      .orderBy("id")
  }

  /** Degree distribution of an undirected pair graph: (deg, n_nodes)
    * histogram — the first scale-sanity plot of any corpus graph (hub
    * detection, power-law eyeballing). Two bounded aggregations: per-node
    * degree, then the ≤max-degree-row histogram. */
  def degreeDistribution(pairs: DataFrame): DataFrame = {
    val und = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
      .orderBy("deg")
  }

  /** Degree assortativity of an undirected pair graph (Newman '02, public):
    * the Pearson correlation of end degrees over edges, in the
    * integer-sums form
    *
    *   r = (4M·Σjk − (Σ(j+k))²) / (2M·Σ(j²+k²) − (Σ(j+k))²)
    *
    * where (j,k) are the two endpoint degrees of each of the M undirected
    * edges. Every Σ is an order-free BIGINT sum; the closing division is
    * ONE double expression mirrored token-for-token by the oracle (the
    * zipfSlope discipline), rounded 6dp. Degenerate denominator (regular
    * graph) → 0.0. One degree join per endpoint, one 1-row aggregate. */
  def assortativity(pairs: DataFrame): DataFrame = {
    val und = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val sums = und
      .join(deg.select(col("v").as("a"), col("deg").as("j")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("k")), "b")
      .agg(count(lit(1)).as("m"),
        sum(col("j") * col("k")).as("_sjk"),
        sum(col("j") + col("k")).as("_sj"),
        sum(col("j") * col("j") + col("k") * col("k")).as("_sq"))
    val num = lit(4.0) * col("m") * col("_sjk") - col("_sj") * col("_sj")
    val den = lit(2.0) * col("m") * col("_sq") - col("_sj") * col("_sj")
    sums.select(col("m").as("n_edges"),
      when(den =!= 0.0, round(num / den, 6)).otherwise(lit(0.0))
        .as("assortativity"))
  }

  /** Per-node local clustering coefficient (Watts-Strogatz '98, public):
    * lcc(v) = 2·t(v) / (deg(v)·(deg(v)−1)) with t(v) = triangles through
    * v — the node-level companion to [[triangleCensus]]'s global
    * transitivity (which near-dup neighborhoods are clique-like, not just
    * how clique-like the graph is on average). Same scale shape as the
    * census: degree-ordered orientation bounds the wedge fan-out at
    * O(m^1.5); the only additions are a 3-way participant explode and a
    * per-node count. Output: (id, deg, n_tri, lcc), deg-0/1 nodes at 0.0. */
  def localClustering(pairs: DataFrame): DataFrame = {
    val und = undirected(pairs).localCheckpoint(true)
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("_db")), "b")
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
    val w1 = oriented.select(col("lo"), col("hi").as("_h1"))
    val w2 = oriented.select(col("lo"), col("hi").as("_h2"))
    val triNodes = w1.join(w2, "lo").filter(col("_h1") < col("_h2"))
      .join(und, col("_h1") === col("a") && col("_h2") === col("b"))
      .select(explode(array(col("lo"), col("_h1"), col("_h2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(triNodes, Seq("v"), "left")
      .select(col("v").as("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** Canonical undirected edge frame of a pair graph: (a, b) with
    * a < b, self-loops dropped, deduped — the shared head of every
    * similarity-graph analytic. */
  private def undirected(pairs: DataFrame): DataFrame =
    pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert, Kumar '07, public), determinized: every node starts labeled
    * with its own id and each round adopts the most frequent label among
    * its neighbors, ties broken by the SMALLEST label — so the result is a
    * pure function of the graph (the paper's random tie-breaks and visit
    * order are replaced by (count desc, label asc), the standard
    * deterministic variant). A FIXED number of synchronous rounds is run
    * (no convergence test): synchronous LPA can 2-cycle on bipartite
    * structures, so "run r rounds" is the reproducible contract, and the
    * oracle reaches the identical state by unrolling the same r rounds.
    * Returns (id, community) for every non-isolated vertex.
    *
    * Scale shape: each round is one edge ⋈ labels join (both directions),
    * one (v, label) count aggregation, and one order-free argmax via
    * max(struct(cnt, −label)) — no windows, no driver data. Rounds are
    * flattened through [[roundCheckpoint]] like the PPR/k-core loops, so
    * lineage stays O(1) and the reliable-checkpoint flag applies. */
  def labelPropagation(pairs: DataFrame, rounds: Int = 4): DataFrame = {
    val und = roundCheckpoint(undirected(pairs))
    var labels = und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .distinct().select(col("v"), col("v").as("lab"))
    for (_ <- 0 until rounds) {
      val nbr = und.join(labels.select(col("v").as("b"), col("lab")), "b")
        .select(col("a").as("v"), col("lab"))
        .unionAll(
          und.join(labels.select(col("v").as("a"), col("lab")), "a")
            .select(col("b").as("v"), col("lab")))
      labels = roundCheckpoint(nbr
        .groupBy("v", "lab").agg(count(lit(1)).as("c"))
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("lab")).as("_nl"))).as("_best"))
        .select(col("v"), (-col("_best._nl")).as("lab")))
    }
    labels.select(col("v").as("id"), col("lab").as("community"))
  }

  /** Newman modularity of a vertex partition over an undirected pair graph
    * (Newman-Girvan '04, public):
    *
    *   Q = Σ_c (e_c/M − (d_c/2M)²)  =  (4M·Σe_c − Σd_c²) / 4M²
    *
    * where e_c = edges inside community c, d_c = degree sum of c, M =
    * total edges — the right-hand integer-sums form is what's computed:
    * every Σ is an order-free BIGINT sum and the closing division is ONE
    * double expression rounded 6dp (the assortativity discipline).
    * `labels` is (id, community); returns one row
    * (n_communities, n_edges, modularity). Plan: two broadcast-or-shuffle
    * hash joins of edges against labels, one per-community aggregate, one
    * 1-row cross — no windows, no iteration. */
  def modularity(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirected(pairs).localCheckpoint(true)
    val lab = labels.select(col("id"), col("community"))
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // per-community degree mass (every community has ≥1 member with ≥1
    // edge — labels come from the same edge set)
    val dc = deg.join(lab.withColumnRenamed("id", "v"), "v")
      .groupBy("community").agg(sum("deg").as("d_c"))
    // per-community internal edges; communities with none contribute only
    // the degree term, hence the left join + coalesce
    val ec = und
      .join(lab.select(col("id").as("a"), col("community").as("_ca")), "a")
      .join(lab.select(col("id").as("b"), col("community").as("_cb")), "b")
      .filter(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("community")).agg(count(lit(1)).as("e_c"))
    val m = und.agg(count(lit(1)).as("m"))
    dc.join(ec, Seq("community"), "left")
      .agg(count(lit(1)).as("n_communities"),
        sum(coalesce(col("e_c"), lit(0L))).as("_se"),
        sum(col("d_c") * col("d_c")).as("_sd"))
      .crossJoin(broadcast(m))
      .select(col("n_communities"), col("m").as("n_edges"),
        when(col("m") > 0,
          round((lit(4.0) * col("m") * col("_se") - col("_sd")) /
            (lit(4.0) * col("m") * col("m")), 6))
          .otherwise(lit(0.0)).as("modularity"))
  }

  /** R11: contribution trace — for each traced node, the top-`maxVia` seeds
    * explaining its PPR score via 1/2/3-hop paths with decay 1.0/0.5/0.25
    * (memory_engine.py:55-82). Explain-only feature: expressed as self-joins
    * on the edge list. Output (id, seed_id, contribution, via_rank). */
  def traceContributors(edgesDf: DataFrame, seeds: DataFrame,
                        tracedIds: DataFrame, maxVia: Int = 5): DataFrame = {
    // the edge list feeds FOUR subtrees (tn, sn, hop3's mid join — and tn
    // itself is read by all three hop branches): left lazy, every branch
    // of the unioned plan re-runs the explode+union+distinct edge build
    // (exchange reuse dedupes the shuffle, not the post-shuffle aggs), and
    // hop2/hop3 each recompute tn ⋈ … and sn ⋈ … independently (r17
    // verdict #5). Materialize each shared intermediate ONCE: n1 = one
    // edge build; tn/sn are bounded (|traced|·deg, |seeds|·deg — this is
    // an explain-over-a-traced-set operator) and read 3×/2×. §2.4.
    val n1 = edgesDf.select(col("src").as("id"), col("dst").as("n1"))
      .localCheckpoint(true)
    val traced = tracedIds.select(col("id"))
    val tn = traced.join(n1, "id").localCheckpoint(true) // neighbors of traced nodes
    // seed neighbors
    val sn = seeds.select(col("id").as("seed_id"), col("p"))
      .join(n1.select(col("id").as("seed_id"), col("n1").as("sn1")), Seq("seed_id"), "left")
      .localCheckpoint(true)
    // 1-hop: seed is a direct neighbor
    val hop1 = tn.join(seeds.select(col("id").as("n1"), col("id").as("seed_id"), col("p")), Seq("n1"))
      .select(col("id"), col("seed_id"), col("p").as("contribution"), lit(1).as("hop"))
    // 2-hop: shared neighbor between node and seed. No .distinct(): the
    // min_by aggregate below collapses duplicate (id, seed_id, c, hop)
    // path rows identically (equal rows cannot change a min), and the
    // groupBy already shuffles once with map-side partial aggregation —
    // the former per-hop distinct was a second full shuffle of the same
    // rows for no semantic effect (guide §2.4: distinct on data whose
    // duplicates the next aggregate absorbs).
    val hop2 = tn.join(sn, col("n1") === col("sn1"))
      .select(col("id"), col("seed_id"), (col("p") * 0.5).as("contribution"), lit(2).as("hop"))
    // 3-hop: a neighbor of the node has a neighbor that neighbors the seed
    val n2 = n1.select(col("n1").as("hop3_mid"), col("id").as("n1"))
    val hop3 = tn
      .join(n1.select(col("n1").as("n2"), col("id").as("n1")), Seq("n1"))
      .join(sn, col("n2") === col("sn1"))
      .select(col("id"), col("seed_id"), (col("p") * 0.25).as("contribution"), lit(3).as("hop"))
    // shortest explaining path wins (the reference's if/elif ladder)
    val best = hop1.unionByName(hop2).unionByName(hop3)
      .filter(col("id") =!= col("seed_id"))
      .groupBy("id", "seed_id")
      .agg(min_by(col("contribution"), col("hop")).as("contribution"))
      .withColumn("contribution", round(col("contribution"), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(desc("contribution"), asc("seed_id"))
    best.withColumn("via_rank", row_number().over(w))
      .filter(col("via_rank") <= maxVia)
  }

  /** R10 candidate build + R12 reserved-slot merge, given the fused RRF pool
    * (memory_engine.py:1614-1723). Returns the final top-k with
    * id/source/category/rrf_score/base_rrf_score/match_type/graph_support. */
  /** [[expandAndMerge]] for the SHARED-PLAN batch (r13 verdict #8):
    * `fused` is (qid, id, rrf); every step of the single-query tail —
    * top-rrf normalization, PPR, the gain/inject candidate filter, the
    * reserved-slot merge — runs per qid over ONE visible-edge frame and
    * ONE batched PPR loop ([[pprBatch]]), instead of N per-query plans
    * each rescanning the edges. Per-qid scalars (topRrf, posSum) collect
    * in one ≤|batch|-row job; qids with no positive seed short-circuit to
    * the direct-only emit exactly like the single path. Output:
    * (id, source, category, rrf_score, base_rrf_score, match_type,
    * graph_support, query_idx) — pinned equal to the per-query union by
    * `r15_batch_graph_indexed`'s oracle. */
  def expandAndMergeBatch(memories: DataFrame, fused: DataFrame,
                          p: HybridSearch.Params): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = memories.sparkSession
    import spark.implicits._
    val f = fused.localCheckpoint(true)
    val k = math.min(p.k, 100)
    // one ≤|batch|-row collect for both per-qid scalars
    val stats = f.groupBy("qid").agg(
        coalesce(max("rrf"), lit(0.0)).as("t"),
        coalesce(sum(when(col("rrf") > 0, col("rrf"))), lit(0.0)).as("ps"))
      .as[(Int, Double, Double)].collect()
      .map { case (q, t, ps) => q -> ((t, ps)) }.toMap
    val direct = f.select(col("qid"), col("id"), col("rrf"))
    val directOut = direct
      .join(memories.select("id", "source", "category"), "id")
      .withColumn("_rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("rrf"), asc("id"))))
      .filter(col("_rn") <= k)
      .select(col("id"), col("source"), col("category"),
        roundScore(col("rrf")).as("rrf_score"),
        roundScore(col("rrf")).as("base_rrf_score"),
        lit("direct").as("match_type"), lit(0.0).as("graph_support"),
        col("qid").cast("int").as("query_idx"))
    val posQids = stats.filter(_._2._1 > 0.0).keys.toSeq.sorted
    // no positive seeds anywhere: the whole batch is the direct emit
    if (posQids.isEmpty) return directOut

    val trrf = broadcast(
      posQids.map(q => (q, stats(q)._1)).toDF("qid", "_trrf"))
    val fp = f.join(trrf, "qid") // the graph-participating qids' pools
    val seeds = fp.filter(col("rrf") > 0)
      .select(col("qid"), col("id"), (col("rrf") / col("_trrf")).as("p"))
    val e = visibleEdges(memories, p.sourcePrefix, p.includeArchived)
    // per-qid seed mass, known driver-side exactly as the single path
    val pTotals = posQids.map(q => (q, stats(q)._2 / stats(q)._1))
      .toDF("qid", "pt")
    val scores = pprBatch(e, seeds, pTotals)

    val maxPprF = scores.groupBy("qid").agg(
      when(coalesce(max("ppr"), lit(1.0)) > 0, coalesce(max("ppr"), lit(1.0)))
        .otherwise(1.0).as("_maxppr"))
    val maxPpr = col("_maxppr")
    val cand = scores
      .join(seeds, Seq("qid", "id"), "left")
      .join(direct.select(col("qid"), col("id"), lit(true).as("is_direct")),
        Seq("qid", "id"), "left")
      .join(broadcast(maxPprF), "qid")
      .join(trrf, "qid")
      .withColumn("orig", coalesce(col("p"), lit(0.0)))
      .withColumn("gain", col("ppr") - col("orig"))
      .withColumn("is_direct", coalesce(col("is_direct"), lit(false)))
      .filter(
        (col("is_direct") && col("gain") > 0) ||
          (!col("is_direct") && col("ppr") / maxPpr >= MinRelative))
      .select(
        col("qid"), col("id"), col("is_direct"),
        roundScore(least(col("gain") / maxPpr * col("_trrf") * lit(p.graphWeight),
          lit(SupportCap) * col("_trrf"))).as("graph_support"),
        roundScore(least(col("ppr") / maxPpr * col("_trrf"),
          lit(SupportCap) * col("_trrf"))).as("inject_score"))
      .localCheckpoint(true)

    val boosted = direct.join(trrf.select("qid"), "qid") // graph qids only
      .join(cand.filter(col("is_direct")).select("qid", "id", "graph_support"),
        Seq("qid", "id"), "left")
      .select(
        col("qid"), col("id"),
        (col("rrf") + coalesce(col("graph_support"), lit(0.0))).as("score"),
        col("rrf").as("base"),
        when(col("graph_support").isNotNull, "direct+graph")
          .otherwise("direct").as("match_type"),
        coalesce(col("graph_support"), lit(0.0)).as("graph_support"))
    val graphOnly = cand.filter(!col("is_direct"))
      .select(
        col("qid"), col("id"), col("inject_score").as("score"),
        lit(0.0).as("base"), lit("graph").as("match_type"), col("graph_support"))

    // per-qid reserved slots: r(qid) = min(2, |graphOnly(qid)|, k) — the
    // single path's limit(2)-count, as one small aggregate over the
    // bounded candidate frame (absent qid ⇒ 0 reserved)
    val resv = graphOnly.groupBy("qid")
      .agg(least(lit(ReservedSlots.toLong), count(lit(1)), lit(k.toLong))
        .cast("int").as("_resv"))
    val bw = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val direct0 = boosted.withColumn("_rn", row_number().over(bw))
      .join(broadcast(resv), Seq("qid"), "left")
      .filter(col("_rn") <= lit(k) - coalesce(col("_resv"), lit(0)))
      .drop("_rn", "_resv")
    val picked =
      if (p.threshold.isDefined) direct0
      else direct0.unionAll(
        graphOnly.withColumn("_rn", row_number().over(bw))
          .join(broadcast(resv), Seq("qid"), "left")
          .filter(col("_rn") <= coalesce(col("_resv"), lit(0)))
          .drop("_rn", "_resv"))

    val graphOut = picked
      .join(memories.select("id", "source", "category"), "id")
      .withColumn("_rn", row_number().over(bw))
      .filter(col("_rn") <= k)
      .select(col("id"), col("source"), col("category"),
        roundScore(col("score")).as("rrf_score"),
        roundScore(col("base")).as("base_rrf_score"),
        col("match_type"), col("graph_support"),
        col("qid").cast("int").as("query_idx"))
    // zero-seed qids keep the direct-only emit
    val zeroQids = stats.keys.toSeq.diff(posQids)
    if (zeroQids.isEmpty) graphOut
    else graphOut.unionAll(directOut.filter(col("query_idx").isin(zeroQids: _*)))
  }

  def expandAndMerge(memories: DataFrame, fused: DataFrame,
                     p: HybridSearch.Params): DataFrame = {
    // eager checkpoint, not persist: the ≤2*oversample-row pool is read by
    // four downstream consumers, and the blocks are GC-freed with the frame
    // (a CacheManager persist would pin them until an explicit unpersist)
    val f = fused.localCheckpoint(true)
    val k = math.min(p.k, 100)
    // one driver round-trip for both scalars (max + positive-sum)
    val statsRow = f.agg(
      coalesce(max("rrf"), lit(0.0)),
      coalesce(sum(when(col("rrf") > 0, col("rrf"))), lit(0.0))).head()
    val topRrf = statsRow.getDouble(0)
    val posSum = statsRow.getDouble(1)
    val direct = f.select(col("id"), col("rrf"))

    if (topRrf <= 0.0) {
      // no positive seeds: graph contributes nothing (memory_engine.py:1597)
      // (direct ≤ pool rows — broadcast it into every corpus attribute
      // join here and below, the HybridSearch fuseContribs hint
      // discipline: the checkpointed pool has no size statistics, and at
      // corpus scale the unhinted join shuffles the memories projection)
      return broadcast(direct)
        .join(memories.select("id", "source", "category"), "id")
        .orderBy(desc("rrf"), asc("id")).limit(k)
        .select(col("id"), col("source"), col("category"),
          roundScore(col("rrf")).as("rrf_score"),
          roundScore(col("rrf")).as("base_rrf_score"),
          lit("direct").as("match_type"), lit(0.0).as("graph_support"))
    }

    val seeds = f.filter(col("rrf") > 0)
      .select(col("id"), (col("rrf") / topRrf).as("p"))
    val e = visibleEdges(memories, p.sourcePrefix, p.includeArchived)
    // sum(p) = sum(positive rrf)/topRrf — already known, skip the extra job
    val scores = ppr(e, seeds, pTotalKnown = Some(posSum / topRrf))

    // max PPR enters as a broadcast 1-row aggregate (same pattern as the
    // dangling mass) — one fewer driver round-trip per graph query
    val maxPprF = scores.agg(
      when(coalesce(max("ppr"), lit(1.0)) > 0, coalesce(max("ppr"), lit(1.0)))
        .otherwise(1.0).as("_maxppr"))
    val maxPpr = col("_maxppr")

    // candidate filter + scaled support/inject (memory_engine.py:1614-1642).
    // Eager checkpoint: the ≤-pool-sized candidate frame feeds THREE
    // consumers (the reserved-slot count, the boosted-direct branch, and
    // the graph-only branch) — unmaterialized, each re-executes the
    // scores⋈seeds⋈direct multi-join with its broadcast sub-jobs
    // (measured: r12 79 → 74, r10 97 → 96 jobs with the single
    // materialization; JobCountSpec ceilings lowered with the change)
    val cand = scores
      .join(seeds, Seq("id"), "left")
      .join(direct.select(col("id"), lit(true).as("is_direct")), Seq("id"), "left")
      .crossJoin(broadcast(maxPprF))
      .withColumn("orig", coalesce(col("p"), lit(0.0)))
      .withColumn("gain", col("ppr") - col("orig"))
      .withColumn("is_direct", coalesce(col("is_direct"), lit(false)))
      .filter(
        (col("is_direct") && col("gain") > 0) ||
          (!col("is_direct") && col("ppr") / maxPpr >= MinRelative))
      .select(
        col("id"), col("is_direct"),
        roundScore(least(col("gain") / maxPpr * topRrf * p.graphWeight,
          lit(SupportCap * topRrf))).as("graph_support"),
        roundScore(least(col("ppr") / maxPpr * topRrf,
          lit(SupportCap * topRrf))).as("inject_score"))
      .localCheckpoint(true)

    // merge (memory_engine.py:1666-1700)
    val boosted = direct
      .join(cand.filter(col("is_direct")).select("id", "graph_support"), Seq("id"), "left")
      .select(
        col("id"),
        (col("rrf") + coalesce(col("graph_support"), lit(0.0))).as("score"),
        col("rrf").as("base"),
        when(col("graph_support").isNotNull, "direct+graph").otherwise("direct").as("match_type"),
        coalesce(col("graph_support"), lit(0.0)).as("graph_support"))
    val graphOnly = cand.filter(!col("is_direct"))
      .select(
        col("id"), col("inject_score").as("score"), lit(0.0).as("base"),
        lit("graph").as("match_type"), col("graph_support"))

    // reserved slots: top-(k-r) non-graph + top-r graph-only, r = min(2, |graph|, k).
    // The reservation happens BEFORE the threshold check: with a threshold
    // set, graph-only rows still claim their slots but are then dropped at
    // emit (similarity unverifiable, memory_engine.py:1697-1714), so the
    // query returns k-r rows — reference semantics, not k direct rows.
    // reserved = min(2, |graphOnly|, k) only needs to know whether 0, 1 or
    // >=2 graph-only rows exist — limit(2) lets the count job early-out
    val graphOnlyCount = graphOnly.limit(ReservedSlots).count()
    val reserved = math.min(math.min(ReservedSlots.toLong, graphOnlyCount), k.toLong).toInt
    val direct0 = boosted.orderBy(desc("score"), asc("id")).limit(k - reserved)
    val picked =
      if (p.threshold.isDefined) direct0
      else direct0.unionAll(graphOnly.orderBy(desc("score"), asc("id")).limit(reserved))

    picked
      .join(memories.select("id", "source", "category"), "id")
      .orderBy(desc("score"), asc("id")).limit(k)
      .select(col("id"), col("source"), col("category"),
        roundScore(col("score")).as("rrf_score"),
        roundScore(col("base")).as("base_rrf_score"),
        col("match_type"), col("graph_support"))
  }
}
