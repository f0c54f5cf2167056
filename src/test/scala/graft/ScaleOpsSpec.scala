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
    val books = Pq.codebooks(emb)
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
