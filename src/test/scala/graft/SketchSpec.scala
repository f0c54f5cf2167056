package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.text.Sketches

/** Count-Min Sketch invariants: the classic guarantees, checked against
  * exact counts on the fixture corpus. */
class SketchSpec extends SparkSpec {

  private lazy val docs = core.Tables.documents(spark, sf())
    .select(col("doc_id").as("id"), col("text"))

  test("CMS never undercounts: est >= true for EVERY distinct term") {
    val truth = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .localCheckpoint(true)
    val cms = Sketches.cmsTermCounts(docs)
    val under = Sketches.cmsEstimate(cms, truth.select("term"))
      .join(truth, Seq("term"))
      .filter(col("est") < col("true_cnt"))
      .count()
    assert(under == 0, "CMS undercounted — hash rows disagree between build and probe")
  }

  test("sketch size is bounded by depth x width regardless of corpus size") {
    assert(Sketches.cmsTermCounts(docs).count() <= Sketches.Depth.toLong * Sketches.Width)
  }

  test("sketches merge cell-wise: cms(A union B) == cms(A) + cms(B)") {
    val a = docs.filter(col("id") % 2 === 0)
    val b = docs.filter(col("id") % 2 =!= 0)
    val merged = Sketches.cmsTermCounts(a)
      .withColumnRenamed("cnt", "ca")
      .join(Sketches.cmsTermCounts(b).withColumnRenamed("cnt", "cb"),
        Seq("d", "cell"), "full")
      .select(col("d"), col("cell"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("cnt"))
    val whole = Sketches.cmsTermCounts(docs)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0)
  }
}
