package graft

import org.apache.spark.sql.functions._
import graft.search.GraphSearch

/** PPR semantics on hand-computed micro-fixtures
  * (tests/test_graph_search.py:30-149 style; constants memory_engine.py:44-52). */
class GraphSearchSpec extends SparkSpec {

  import spark.implicits._

  /** Reference PPR loop transliterated for tiny fixtures. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Map[Long, Double],
                     iters: Int = 3, alpha: Double = 0.85): Map[Long, Double] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var ppr = seeds
    val pTotal = seeds.values.sum
    for (_ <- 1 to iters) {
      val dangling = ppr.collect { case (n, s) if adj.getOrElse(n, Set()).isEmpty => s }.sum
      val next = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for ((n, p) <- seeds) next(n) += (1 - alpha) * p + alpha * dangling * p / pTotal
      for ((n, s) <- ppr; nb = adj.getOrElse(n, Set.empty); if nb.nonEmpty; m <- nb)
        next(m) += alpha * s / nb.size
      ppr = next.toMap
    }
    ppr
  }

  test("PPR matches the hand loop on a 2-hop chain with a dangling seed") {
    // graph: 1-2-3 chain; seed on 1 (1.0) and isolated 9 (0.5)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
      .unionAll(Seq((2L, 1L), (3L, 2L)).toDF("src", "dst"))
    val seeds = Seq((1L, 1.0), (9L, 0.5)).toDF("id", "p")
    val got = GraphSearch.ppr(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(Seq((1L, 2L), (2L, 3L)), Map(1L -> 1.0, 9L -> 0.5))
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
  }

  test("reliable-checkpoint flag: identical PPR through the checkpoint dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ppr_ckpt").toString
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 1.0)).toDF("id", "p")
    val local = GraphSearch.ppr(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(GraphSearch.ReliableCheckpointConf, "true")
    try {
      val reliable = GraphSearch.ppr(edges, seeds).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(reliable == local)
      // the rounds really went through the reliable path: checkpoint files
      // exist under the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .anyMatch(p => java.nio.file.Files.isRegularFile(p))
      assert(wrote, s"no checkpoint files under $dir")
    } finally {
      spark.conf.set(GraphSearch.ReliableCheckpointConf, "false")
      graft.sources.Store.deleteRecursive(dir)
    }
  }

  test("1-hop neighbor outscores 2-hop neighbor") {
    val fwd = Seq((1L, 2L), (2L, 3L))
    val edges = (fwd ++ fwd.map(e => (e._2, e._1))).toDF("src", "dst")
    val seeds = Seq((1L, 1.0)).toDF("id", "p")
    val scores = GraphSearch.ppr(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(3L))
  }

  test("pageRank matches the integer hand loop; hub outranks leaves; isolates keep the base") {
    // star: 1 — {2,3,4} (bidirectional related_to); 5 isolated
    val mem = Seq(
      (1L, Seq(2L, 3L, 4L)),
      (2L, Seq.empty[Long]), (3L, Seq.empty[Long]), (4L, Seq.empty[Long]),
      (5L, Seq.empty[Long])
    ).toDF("id", "tos")
      .withColumn("links", expr(
        "transform(tos, t -> named_struct('to_id', t, 'link_type', 'related_to', 'created_at', CAST(NULL AS TIMESTAMP)))"))
    val got = GraphSearch.pageRank(mem).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference integer loop (micro-units, truncating division)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += pr(s) / deg(s)
      pr = nodes.map(n => n -> (150000L + 85L * in(n) / 100L)).toMap
    }
    assert(got.keySet == nodes.toSet)
    for (n <- nodes) assert(got(n) == pr(n) / 1e6, s"node $n: ${got(n)} vs ${pr(n)}")
    assert(got(1L) > got(2L), "the hub must outrank a leaf")
    assert(got(2L) == got(3L) && got(3L) == got(4L), "symmetric leaves tie")
    assert(got(5L) == 0.15, "an isolated node keeps only the base term")
  }

  test("components: chains merge under min labels, linkless nodes are singletons") {
    // 1-2-3 chain, 4-5 pair, 6 isolated
    val mem = Seq(
      (1L, Seq(2L)), (2L, Seq(3L)), (3L, Seq.empty[Long]),
      (4L, Seq(5L)), (5L, Seq.empty[Long]), (6L, Seq.empty[Long])
    ).toDF("id", "tos")
      .withColumn("links", expr(
        "transform(tos, t -> named_struct('to_id', t, 'link_type', 'related_to', 'created_at', CAST(NULL AS TIMESTAMP)))"))
    val got = GraphSearch.components(mem).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (4L, 2L), 5L -> (4L, 2L), 6L -> (6L, 1L)))
  }

  test("landmarkDistances: exact hops on a chain, depth bound, early-out island") {
    // chain 1-2-3-4-5-6-7 plus isolated 9: from landmark 1, dist = hops
    // along the chain capped at maxHops; the isolate is its own landmark
    // whose BFS early-outs after one empty frontier
    val mem = Seq(
      (1L, Seq(2L)), (2L, Seq(3L)), (3L, Seq(4L)), (4L, Seq(5L)),
      (5L, Seq(6L)), (6L, Seq(7L)), (7L, Seq.empty[Long]), (9L, Seq.empty[Long])
    ).toDF("id", "tos")
      .withColumn("links", expr(
        "transform(tos, t -> named_struct('to_id', t, 'link_type', 'related_to', 'created_at', CAST(NULL AS TIMESTAMP)))"))
    val got = GraphSearch.landmarkDistances(mem, Seq(1L, 9L), maxHops = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3), (1L, 5L, 4),
      (9L, 9L, 0))) // 6,7 beyond the depth bound; 9 reaches nothing
    // first discovery is the exact distance even with a shortcut edge
    val mem2 = Seq(
      (1L, Seq(2L, 3L)), (2L, Seq(3L)), (3L, Seq.empty[Long])
    ).toDF("id", "tos")
      .withColumn("links", expr(
        "transform(tos, t -> named_struct('to_id', t, 'link_type', 'related_to', 'created_at', CAST(NULL AS TIMESTAMP)))"))
    val got2 = GraphSearch.landmarkDistances(mem2, Seq(1L), maxHops = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got2 == Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 1)))
  }

  test("edges(): bidirectional, self/dangling dropped, order-robust") {
    val mem = Seq(
      (1L, Seq((2L, "related_to")), false),
      (2L, Seq((2L, "related_to"), (99L, "related_to")), false), // self + dangling
      (3L, Seq((1L, "supersedes")), false) // wrong type
    ).toDF("id", "rawLinks", "archived")
      .withColumn("links", expr(
        "transform(rawLinks, l -> named_struct('to_id', l._1, 'link_type', l._2, 'created_at', CAST(NULL AS TIMESTAMP)))"))
      .withColumn("source", lit("s"))
    val e = GraphSearch.edges(mem).as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L), (2L, 1L)))
  }

  test("scope filter blocks out-of-scope transit nodes") {
    val mem = Seq(
      (1L, "keep/a", false, Seq(2L)),
      (2L, "drop/b", false, Seq(3L)), // out of scope: bridges 1-3
      (3L, "keep/c", false, Seq.empty[Long])
    ).toDF("id", "source", "archived", "tos")
      .withColumn("links", expr(
        "transform(tos, t -> named_struct('to_id', t, 'link_type', 'related_to', 'created_at', CAST(NULL AS TIMESTAMP)))"))
    val e = GraphSearch.visibleEdges(mem, Some("keep"), includeArchived = false)
    assert(e.count() == 0) // both 1-2 and 2-3 touch the out-of-scope node
  }
}
