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

  test("HLL overlap: inclusion-exclusion tracks constructed partial/zero overlap") {
    val s2 = spark
    import s2.implicits._
    // slice A: 200 own terms + 800 shared; slice B: 200 own + the same
    // 800 shared -> true overlap 800 of a 1200-term union; then a fully
    // disjoint pair -> overlap 0. With m = 64 the inclusion-exclusion
    // noise floor is ~sigma*(|A|+|B|+|A∪B|) ≈ 0.13 * 3-4k terms — a few
    // hundred absolute — so the pinned properties are a WIDE envelope on
    // the large overlap plus the ordering vs the disjoint case (the
    // resolution a 64-bucket sketch honestly has)
    def corpus(sharedB: Boolean) = (
      (0 until 20).map(i => (i.toLong, "src1/x",
        (0 until 10).map(j => s"a${i * 10 + j}").mkString(" "))) ++
      (0 until 80).map(i => (100L + i, "src1/x",
        (0 until 10).map(j => s"s${i * 10 + j}").mkString(" "))) ++
      (0 until 20).map(i => (200L + i, "other/y",
        (0 until 10).map(j => s"b${i * 10 + j}").mkString(" "))) ++
      (0 until 80).map(i => (300L + i, "other/y",
        (0 until 10).map(j => s"${if (sharedB) "s" else "c"}${i * 10 + j}").mkString(" ")))
      ).toDF("id", "source", "text")
    val part = Sketches.hllOverlap(corpus(sharedB = true),
      col("source").startsWith("src1")).head()
    assert(part.getLong(0) == 800L)
    val est = part.getDouble(4)
    assert(est / 800.0 > 0.3 && est / 800.0 < 1.7, s"overlap est $est vs 800")
    val none = Sketches.hllOverlap(corpus(sharedB = false),
      col("source").startsWith("src1")).head()
    assert(none.getLong(0) == 0L)
    assert(part.getDouble(4) - none.getDouble(4) > 200.0,
      s"partial (${part.getDouble(4)}) must clearly exceed disjoint (${none.getDouble(4)})")
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
