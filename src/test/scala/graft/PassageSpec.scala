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
