package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, IndexBuild}
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

  test("kmeans IVF build assigns every row to a valid cell") {
    val emb = Tables.embeddings(spark, sf()).select(col("vec_id").as("id"), col("embedding"))
    val (assigned, centroids) = IndexBuild.kmeansIvf(emb, nlist = 4, maxIter = 5)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("ivf_cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet) && cells.nonEmpty)
    assert(centroids.count() == 4)
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
