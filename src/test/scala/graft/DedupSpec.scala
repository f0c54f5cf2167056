package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Clusters, Dedup, MinHashLsh, SimHash}

/** Dedup family on micro-fixtures: thresholds 0.80/0.90/0.95
  * (memory_engine.py:2199, 2575-2576), union-find + tighten
  * (memory_engine.py:2274-2342), MinHash/SimHash determinism. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private def unit(xs: Double*): Seq[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat)
  }

  // planted fixture: 1~2 at sim ~0.96, 3~4 at ~0.91, 5 isolated
  private lazy val mem = Seq(
    (1L, unit(1, 0, 0, 0.0)),
    (2L, unit(1, 0, 0, 0.28)), // cos ~0.963
    (3L, unit(0, 1, 0, 0.0)),
    (4L, unit(0, 1, 0, 0.45)), // cos ~0.912
    (5L, unit(0, 0, 1, 0.0))
  ).toDF("id", "embedding")

  test("findDuplicates honors threshold bands") {
    val at95 = Dedup.findDuplicates(mem, 0.95).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(at95 == Set((1L, 2L)))
    val at90 = Dedup.findDuplicates(mem, 0.90).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(at90 == Set((1L, 2L), (3L, 4L)))
  }

  test("deduplicate removes the higher id of each pair") {
    val kept = Dedup.deduplicate(mem, 0.90).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("connected components: chain collapses to min id") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (7L, 8L, 0.9))
      .toDF("id_a", "id_b", "similarity")
    val comp = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("driver union-find CC == distributed iterative CC") {
    // long chain (exercises pointer jumping), a star, a cycle, singleton pair
    val edges = ((1L to 40L).sliding(2).map(s => (s.head, s.last)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L),
        (200L, 201L), (201L, 202L), (202L, 200L), (300L, 301L))).toSeq
    val pairs = edges.toDF("id_a", "id_b")
    val auto = Clusters.connectedComponentsAuto(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == dist)
    // and the forced-distributed route through the auto switch
    val forced = Clusters.connectedComponentsAuto(pairs, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forced == dist)
  }

  test("tighten drops chain-connected weak members") {
    // A~B, B~C but A!~C: with threshold t every member of {A,B,C} is similar
    // to >= (3-1)/2 = 1 member, so all survive; a lone appendix D~A only
    // similar to A among {A,B,C,D} has 1 >= 1.5? no -> D dropped
    val pairs = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.9), (1L, 4L, 0.9)
    ).toDF("id_a", "id_b", "similarity")
    val out = Clusters.similarClusters(pairs, threshold = 0.85)
      .as[(Long, Long)].collect().toSet
    // csize=4: need similar_count >= 1.5 -> only 1 (count 2) and 2 (count 2)
    assert(out.map(_._2) == Set(1L, 2L))
  }

  test("minhash signatures are deterministic and band-collide for near-dups") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (3L, "completely different content about spark shuffle partitions and joins")
    ).toDF("id", "text")
    val sig1 = MinHashLsh.shingleSets(docs, 3)
      .select(MinHashLsh.signature(col("sh"))).collect()
    val sig2 = MinHashLsh.shingleSets(docs, 3)
      .select(MinHashLsh.signature(col("sh"))).collect()
    assert(sig1.map(_.toString).toSeq == sig2.map(_.toString).toSeq)
    val cands = MinHashLsh.candidatePairs(docs, 3).as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
    val nd = MinHashLsh.nearDuplicates(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((1L, 2L)))
  }

  test("simhash: near-identical texts land within hamming 3, distinct far") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "totally unrelated words appear here nothing shared whatsoever")
    ).toDF("id", "text")
    val fps = SimHash.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
    val nd = SimHash.nearDuplicates(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 2L)))
  }

  // 64-dim fixture with IDENTICAL vectors per planted pair: identical rows
  // share every LSH band key, so the candidate join must surface them no
  // matter which hyperplanes the deterministic LCG generates
  private def axis(d0: Int): Seq[Float] = (0 until 64).map(d => if (d == d0) 1f else 0f)
  private lazy val mem64 = Seq(
    (1L, axis(0), 100L), (2L, axis(0), 200L),
    (3L, axis(1), 100L), (4L, axis(1), 200L),
    (5L, axis(2), 100L)
  ).toDF("id", "embedding", "ts")
    .withColumn("created_at", timestamp_seconds(col("ts"))).drop("ts")
  // a corpusRows stat above the broadcast bound forces the LSH branch of
  // topNeighborsAuto — pins that the scale path is reachable from EVERY
  // caller, not just findDuplicates (round-2 verdict item #1)
  private val forceLsh = Some(Dedup.BroadcastMaxRows + 1)

  test("LSH scale path: deduplicate keeps the lower id of each planted pair") {
    val kept = Dedup.deduplicate(mem64, 0.90, corpusRows = forceLsh)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    // and the stat-below-bound route must reproduce the exact kernel
    val exact = Dedup.deduplicate(mem64, 0.90, corpusRows = Some(5L))
      .select("id").as[Long].collect().toSet
    assert(exact == kept)
  }

  test("LSH scale path: smartImportActions resolves bands through the LSH kernel") {
    val incoming = Seq((10L, axis(0), 300L), (11L, axis(7), 300L))
      .toDF("id", "embedding", "ts")
      .withColumn("created_at", timestamp_seconds(col("ts"))).drop("ts")
    val acts = Dedup.smartImportActions(incoming, mem64, corpusRows = forceLsh)
      .select("id", "action").as[(Long, String)].collect().toMap
    assert(acts(10L) == "skip") // identical to existing id 1 -> sim 1.0 >= 0.95
    assert(acts(11L) == "add")  // fresh axis: no candidate or sim 0 < 0.80
  }

  test("LSH scale path: autoLink links a new row to its identical neighbor") {
    val newIds = Seq(Tuple1(2L)).toDF("id")
    val links = graft.ops.Mutations.autoLink(mem64, newIds, corpusRows = forceLsh)
      .select("id", "to_id").as[(Long, Long)].collect().toSet
    assert(links == Set((2L, 1L))) // sim(2,1)=1.0; orthogonal rest < 0.2
  }

  test("incremental CC: batch merges, brand-new nodes, no-op batch, fail-loud bound") {
    import graft.dedup.Clusters
    def cc(rows: (Long, Long)*) = rows.toDF("id_a", "id_b")
    // base: {1-2-3} and {10-11}; batch bridges them (3,10), extends with a
    // brand-new chain (20,21) and hooks 21 into 11
    val base = cc(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val labels = Clusters.connectedComponentsAuto(base)
    val got = Clusters.connectedComponentsIncremental(
        labels, cc(3L -> 10L, 20L -> 21L, 21L -> 11L))
      .as[(Long, Long)].collect().toMap
    val full = Clusters.connectedComponentsAuto(
        base.unionAll(cc(3L -> 10L, 20L -> 21L, 21L -> 11L)))
      .as[(Long, Long)].collect().toMap
    assert(got == full)
    assert(got(21L) == 1L && got(20L) == 1L) // everything reached min id 1
    // a batch that merges nothing returns the labels unchanged
    val noop = Clusters.connectedComponentsIncremental(labels, cc(1L -> 3L))
      .as[(Long, Long)].collect().toMap
    assert(noop == labels.as[(Long, Long)].collect().toMap)
    // the driver bound fails loudly instead of silently truncating
    intercept[IllegalArgumentException] {
      Clusters.connectedComponentsIncremental(labels, cc(3L -> 10L, 20L -> 21L),
        maxBatchEdges = 1L)
    }
  }

  test("consolidation candidate bound is hash-spread, not first-N-by-id") {
    // the reference caps candidates with random.sample
    // (consolidator.py:78); an id-ordered head cut would consolidate only
    // the OLDEST memories forever. Two tight clusters: ids 1-6 on axis 0,
    // ids 101-106 on axis 1. The 6-row hash-spread cut keeps
    // {2, 4, 6, 102, 104, 106} — three members from EACH cluster, so BOTH
    // consolidate (minClusterSize 3); a head cut {1..6} would only ever
    // find the low cluster. The driver-side LCG replay pins the cut.
    val mem = ((1L to 6L).map(i => (i, unit(1, 0, 0, 0))) ++
      (101L to 106L).map(i => (i, unit(0, 1, 0, 0))))
      .toDF("id", "embedding")
    def lcg(i: Long) = ((i % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    val predicted = ((1L to 6L) ++ (101L to 106L))
      .sortBy(i => (lcg(i), i)).take(6).sorted
    assert(predicted == Seq(2L, 4L, 6L, 102L, 104L, 106L),
      s"fixture must discriminate spread vs head order: $predicted")
    val got = graft.dedup.Consolidation
      .consolidationClusters(mem, threshold = 0.75, maxCandidates = 6)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 2L), (2L, 4L), (2L, 6L),
      (102L, 102L), (102L, 104L), (102L, 106L)),
      s"both id-range extremes must consolidate from the spread cut: $got")
  }
}
