package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.search.Passage

/** Passage-level MaxP invariants: the line decomposition keeps trimmed
  * non-empty passages in document order, ties between equal-scoring
  * passages resolve to the EARLIEST position, and the full distributed
  * MaxP reproduces a driver-side best-passage fold over the c4 pages. */
class PassageSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64

  private def embed(text: String): Array[Float] =
    graft.expressions.TextKernels
      .hashEmbed(UTF8String.fromString(text), dim).toFloatArray()

  private def dot(a: Array[Float], b: Seq[Float]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)

  test("passages keeps trimmed non-empty lines in document order") {
    val pages = Seq((1L, "a b c\n\n  d e \nf")).toDF("id", "text")
    val got = Passage.passages(pages)
      .select("id", "pos", "para").as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 0, "a b c"), (1L, 1, "d e"), (1L, 2, "f")))
  }

  test("equal-scoring passages tie to the earliest position") {
    val pages = Seq((1L, "same words here\nsame words here")).toDF("id", "text")
    val qv = embed("same words here").toSeq
    val got = Passage.maxP(pages, qv, k = 1)
      .select("id", "n_passages", "best_pos").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 0)))
  }

  test("indexed MaxP with an exhaustive probe IS the brute maxP") {
    // nprobe = cellCount ⇒ the probed pool is every passage, so the
    // index-backed leg must reproduce the corpus-scan leg bit for bit
    // (including n_passages: all passages of every doc are in-pool)
    val pages = Queries.c4Pages(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val path = "/root/repo/target/tmp/passage_spec_ivf"
    graft.sources.Store.deleteRecursive(path)
    Passage.buildIndex(pages, path)
    val nCells = graft.ann.IvfIndex.cellCount(spark, path)
    val exhaustive = Passage.maxPIndexed(spark, path, qv, k = 10, nprobe = nCells)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val brute = Passage.maxP(pages, qv, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(exhaustive == brute)
    graft.sources.Store.deleteRecursive(path)
  }

  test("passage index rides the shared O(batch) refresh lifecycle") {
    // build over half the pages, refresh with the other half's passage
    // embeddings (classic IVF add against the STORED centroids), then an
    // exhaustive probe must reproduce brute MaxP over the FULL corpus —
    // every refreshed passage landed, none duplicated, the maintenance
    // machinery is the one IvfIndex lifecycle with no passage special case
    val pages = Queries.c4Pages(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val path = "/root/repo/target/tmp/passage_refresh_ivf"
    graft.sources.Store.deleteRecursive(path)
    Passage.buildIndex(pages.filter(col("id") % 2 === 0), path)
    graft.ann.IvfIndex.refresh(spark, path,
      Passage.passageEmbeddings(pages.filter(col("id") % 2 === 1)))
    val nCells = graft.ann.IvfIndex.cellCount(spark, path)
    val refreshed = Passage.maxPIndexed(spark, path, qv, k = 10, nprobe = nCells)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val brute = Passage.maxP(pages, qv, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(refreshed == brute)
    graft.sources.Store.deleteRecursive(path)
  }

  test("trained passage index with an exhaustive probe IS brute MaxP") {
    // the trained-centroid production build (r15 verdict #3) rides the
    // same lifecycle: probing every cell must reproduce the brute leg bit
    // for bit regardless of how the cells were seeded
    val pages = Queries.c4Pages(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val path = "/root/repo/target/tmp/passage_trained_ivf"
    graft.sources.Store.deleteRecursive(path)
    Passage.buildIndexTrained(pages, path)
    val nCells = graft.ann.IvfIndex.cellCount(spark, path)
    val trained = Passage.maxPIndexed(spark, path, qv, k = 10, nprobe = nCells)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val brute = Passage.maxP(pages, qv, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(trained == brute)
    graft.sources.Store.deleteRecursive(path)
  }

  test("the composite pid bound fail-louds past PosStride passages") {
    // a pos >= PosStride must raise, not wrap into a colliding pid; the
    // guard lives inside the pid expression itself, driven here with a
    // faked pos (a real page that size is ~10⁶ lines — the guard is the
    // point, not the fixture). An in-bound pos passes through unchanged.
    val ok = Seq((7L, 3L)).toDF("id", "pos")
      .select(Passage.pidCol.as("pid")).head.getLong(0)
    assert(ok == 7L * Passage.PosStride + 3L)
    val err = intercept[Exception] {
      Seq((7L, Passage.PosStride + 5L)).toDF("id", "pos")
        .select(Passage.pidCol.as("pid")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("overflows the composite pid")), err.toString)
  }

  test("the composite pid bound fail-louds on out-of-range doc ids") {
    // a doc id >= 2^43 (or a negative one) would silently overflow/corrupt
    // the composite pid and the div/mod decode — both must raise instead
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // the boundary id passes (MaxDocId - 1 is the largest legal id)
    val ok = Seq((Passage.MaxDocId - 1L, 3L)).toDF("id", "pos")
      .select(Passage.pidCol.as("pid")).head.getLong(0)
    assert(ok == (Passage.MaxDocId - 1L) * Passage.PosStride + 3L)
    Seq(Passage.MaxDocId, -1L).foreach { badId =>
      val err = intercept[Exception] {
        Seq((badId, 3L)).toDF("id", "pos")
          .select(Passage.pidCol.as("pid")).collect()
      }
      assert(msgs(err).exists(_.contains("overflows/corrupts the composite pid")),
        s"id = $badId: ${err.toString}")
    }
  }

  test("maxP reproduces a driver-side best-passage fold over the c4 pages") {
    val pages = Queries.c4Pages(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val expected = pages.select("id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val ps = text.split("\n").map(_.trim).filter(_.nonEmpty)
        val scored = ps.zipWithIndex.map { case (p, pos) =>
          (BigDecimal(dot(embed(p), qv) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, pos)
        }
        val (sm, pos) = scored.maxBy { case (s, p) => (s, -p) }
        (id, ps.length.toLong, pos, sm)
      }
      .sortBy { case (id, _, _, sm) => (-sm, id) }.take(10)
      .map { case (id, n, pos, sm) =>
        (id, n, pos, BigDecimal(sm / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    val got = Passage.maxP(pages, qv, k = 10)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got == expected)
  }
}
