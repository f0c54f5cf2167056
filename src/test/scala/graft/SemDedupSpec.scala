package graft

import org.apache.spark.sql.functions._
import graft.core.{Corpus, Tables}
import graft.dedup.SemDedup
import graft.functions.VectorFunctions.{dot, roundScore}

/** SemDeDup correctness: with one cell it must equal the exhaustive
  * embedding-dedup rule (the d2/d3 drop-higher-id semantics it
  * approximates), and cells must genuinely partition the pair space. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private val eps = 0.3

  private lazy val mem = Corpus.memories(spark, sf())
    .select("id", "embedding").limit(120).localCheckpoint(true)

  test("single-cell SemDeDup == exhaustive drop-higher-id dedup") {
    // one all-zero... a single unit centroid puts every row in cell 0
    val dim = mem.select(size(col("embedding"))).head().getInt(0)
    val one = Seq((0, Array.fill(dim)(1.0 / math.sqrt(dim))))
      .toDF("label", "centroid")
    val got = SemDedup.semanticDedup(mem, one, eps)
      .select("id").as[Long].collect().sorted
    // exhaustive: drop any id with a smaller-id eps-neighbor, no cells
    val a = mem.select(col("id").as("id_a"), col("embedding").as("_ea"))
    val b = mem.select(col("id").as("id_b"), col("embedding").as("_eb"))
    val droppedIds = a.crossJoin(b).filter(col("id_b") < col("id_a"))
      .filter(roundScore(dot(col("_ea"), col("_eb"))) >= eps)
      .select(col("id_a")).distinct().as[Long].collect().toSet
    val want = mem.select("id").as[Long].collect().filterNot(droppedIds).sorted
    assert(got.sameElements(want))
    assert(got.length < mem.count(), "fixture must actually drop something")
  }

  test("salted cell self-join: planted hot cell, result identical to the plain cell join") {
    // 100 of 120 rows land in ONE cell (a single dominant centroid
    // direction): the skew fixture for the salted pair join (r17 verdict
    // #7). The shipped salted path must equal the plain ivf_cell join —
    // every pair matches exactly once — and still actually drop rows.
    val dim = mem.select(size(col("embedding"))).head().getInt(0)
    def axis(c: Int) = { val a = Array.fill(dim)(0.0); a(c) = 1.0; a.toSeq }
    val cents = Seq((0, axis(0)), (1, axis(1))).toDF("label", "centroid")
    val skewed = mem.withColumn("embedding",
      when(col("id") % 6 === 0, col("embedding"))
        .otherwise(transform(sequence(lit(1), lit(dim)),
          i => when(i === 1, lit(1.0f)).otherwise(col("embedding")(i - 1) * 0.01f))))
    val got = SemDedup.semanticDedup(skewed, cents, eps)
      .select("id").as[Long].collect().sorted
    // reference: the plain (unsalted) cell join, inline
    val assigned = graft.ann.Ann.assign(
        skewed.select("id", "embedding"), cents)
      .select(col("id"), col("ivf_cell"), col("embedding"))
    val a = assigned.select(col("id").as("id_a"), col("ivf_cell"), col("embedding").as("_ea"))
    val b = assigned.select(col("id").as("id_b"), col("ivf_cell"), col("embedding").as("_eb"))
    val droppedIds = a.join(b, Seq("ivf_cell"))
      .filter(col("id_b") < col("id_a"))
      .filter(roundScore(dot(col("_ea"), col("_eb"))) >= eps)
      .select("id_a").as[Long].collect().toSet
    val want = assigned.select("id").as[Long].collect()
      .filterNot(droppedIds).sorted
    assert(got.sameElements(want))
    assert(droppedIds.nonEmpty, "hot-cell fixture must actually drop rows")
    // the hot cell really is hot
    val cellSizes = assigned.groupBy("ivf_cell").count()
      .as[(Int, Long)].collect().toMap
    assert(cellSizes.values.max >= 90, s"fixture skew collapsed: $cellSizes")
    // and the shipped plan keys the pair join on the salt
    val plan = SemDedup.semanticDedup(skewed, cents, eps)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"),
      s"pair join must carry the salt key:\n${plan.take(1500)}")
  }

  test("semanticContamination flags exactly the same-cell cross-slice pairs over eps") {
    val cent = graft.ann.Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val bench = mem.filter(col("id") % 20 === 3)
    val train = mem.filter(col("id") % 20 =!= 3)
    // eps low enough that the tiny sf0.001 slice yields live pairs — the
    // point here is exhaustive-reference equality, not the threshold
    val ceps = 0.05
    val got = SemDedup.semanticContamination(train, bench, cent, ceps)
      .as[(Long, Long, Double)].collect().toSet
    // exhaustive cross-slice reference restricted to same-cell pairs
    val assigned = graft.ann.Ann.assign(mem, cent)
    val t = assigned.filter(col("id") % 20 =!= 3)
      .select(col("id"), col("ivf_cell"), col("embedding").as("_et"))
    val b = assigned.filter(col("id") % 20 === 3)
      .select(col("id").as("bench_id"), col("ivf_cell"), col("embedding").as("_eb"))
    val want = t.join(b, "ivf_cell")
      .withColumn("sim", roundScore(dot(col("_et"), col("_eb"))))
      .filter(col("sim") >= ceps)
      .select("id", "bench_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce at least one flagged pair")
    // a planted duplicate of a bench row in the train slice is always
    // caught: identical unit vectors share a cell and cosine 1.0
    val benchRow = bench.orderBy("id").limit(1)
    val planted = benchRow.select((col("id") + 1000000L).as("id"), col("embedding"))
    val hit = SemDedup.semanticContamination(planted, bench, cent, eps = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(hit.length == 1 && hit.head._3 >= 0.999)
  }

  test("cells partition the pair space: no cross-cell pair is considered") {
    // real fixture centroids -> multiple cells; survivors must equal the
    // union of per-cell exhaustive dedups (a cross-cell eps-pair, if any,
    // must NOT cause a drop)
    val cent = graft.ann.Ann.centroidsByLabel(Tables.embeddings(spark, sf()))
    val assigned = graft.ann.Ann.assign(mem, cent).localCheckpoint(true)
    assert(assigned.select("ivf_cell").distinct().count() > 1)
    val got = SemDedup.semanticDedup(mem, cent, eps)
      .select("id").as[Long].collect().sorted
    val perCell = assigned.select("ivf_cell").distinct().as[Int].collect()
      .flatMap { c =>
        val cellRows = assigned.filter(col("ivf_cell") === c)
        val a = cellRows.select(col("id").as("id_a"), col("embedding").as("_ea"))
        val b = cellRows.select(col("id").as("id_b"), col("embedding").as("_eb"))
        val dropped = a.crossJoin(b).filter(col("id_b") < col("id_a"))
          .filter(roundScore(dot(col("_ea"), col("_eb"))) >= eps)
          .select(col("id_a")).distinct().as[Long].collect().toSet
        cellRows.select("id").as[Long].collect().filterNot(dropped)
      }.sorted
    assert(got.sameElements(perCell))
  }
}
