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

  test("HLL registers merge as cell-wise max: hll(A union B) == max(hll(A), hll(B))") {
    val a = docs.filter(col("id") % 2 === 0)
    val b = docs.filter(col("id") % 2 =!= 0)
    val merged = Sketches.hllRegisters(a).withColumnRenamed("r", "ra")
      .join(Sketches.hllRegisters(b).withColumnRenamed("r", "rb"),
        Seq("bucket"), "full")
      .select(col("bucket"),
        greatest(coalesce(col("ra"), lit(0)), coalesce(col("rb"), lit(0))).as("r"))
    val whole = Sketches.hllRegisters(docs)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0)
  }

  test("HLL estimate lands within the m=64 error envelope on a wide synthetic vocab") {
    // the fixture vocabulary is tiny (linear-counting branch — exercised by
    // the sk_hll_distinct oracle); a generated 3000-term corpus drives the
    // raw-estimate branch, where sigma ~= 1.04/sqrt(64) = 13%
    val s2 = spark
    import s2.implicits._
    val wide = (0 until 300)
      .map(i => (i.toLong, (0 until 10).map(j => s"tok${i * 10 + j}").mkString(" ")))
      .toDF("id", "text")
    val row = Sketches.hllDistinctTerms(wide).head()
    val (truth, est) = (row.getLong(0), row.getDouble(1))
    assert(truth == 3000L)
    assert(math.abs(est / truth - 1.0) < 0.4,
      s"HLL estimate $est too far from $truth")
  }

  test("grouped HLL per key == the global sketch over that key's slice") {
    val d = core.Tables.documents(spark, sf())
      .select(col("doc_id").as("id"), col("text"), col("source"))
    val grouped = Sketches.hllDistinctByKey(d, "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    for (key <- grouped.keys.toSeq.sorted.take(3)) {
      val row = Sketches.hllDistinctTerms(d.filter(col("source") === key)).head()
      assert(grouped(key) ==
        ((row.getLong(0), row.getDouble(1), row.getLong(2))),
        s"per-key sketch for $key diverges from the filtered global build")
    }
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
