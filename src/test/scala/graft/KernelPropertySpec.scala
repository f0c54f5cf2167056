package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins for the native kernels: KernelEquivalenceSpec checks
  * kernel == HOF on the fixture corpus; these checks do it on GENERATED
  * inputs — adversarial token shapes (empty strings, repeated tokens,
  * unicode, huge whitespace runs) that a fixture never covers. Inputs come
  * from ScalaCheck generators driven by FIXED seeds, so failures reproduce
  * exactly; each round drives one Spark job over a generated batch. */
class KernelPropertySpec extends SparkSpec {

  import spark.implicits._

  // token alphabet chosen to force hash/tie collisions: tiny vocabulary,
  // repeated words, mixed case, digits, non-ascii
  private val word = Gen.oneOf("a", "b", "ab", "A", "7", "x9", "é", "zz", "a", "b")
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, Gen.oneOf(" ", "  ", "\t", "\n"))
    words <- Gen.listOfN(n, word)
  } yield words.zip(ws).map { case (w, s) => w + s }.mkString

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private def batch(texts: List[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("winnowing kernels == HOF forms on generated text (ties, unicode, whitespace)") {
    for (seed <- 1L to 8L) {
      val df = batch(sample(Gen.listOfN(25, text), seed))
      val sel = df.select(
        graft.text.TextAnalysis.winnowingFingerprint(col("text")).as("a"),
        graft.text.TextAnalysis.winnowingFingerprintHof(col("text")).as("b"))
      assert(sel.filter(col("a") =!= col("b")).count() == 0, s"seed $seed")
      val pos = graft.text.TextAnalysis.winnowedPositions(df)
      val posHof = graft.text.TextAnalysis.winnowedPositionsHof(df)
      assert(pos.exceptAll(posHof).count() == 0 &&
        posHof.exceptAll(pos).count() == 0, s"seed $seed")
    }
  }

  test("shingle/simhash kernels are total and consistent on generated text") {
    for (seed <- 1L to 8L) {
      val df = batch(sample(Gen.listOfN(25, text), seed))
      val sh = graft.functions.TextFunctions.shingleHashes(col("text"), 3)
      val out = df.select(
        size(sh).as("n_sh"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tok"),
        graft.dedup.SimHash.fingerprint(col("text")).as("fp")).collect()
      out.foreach { r =>
        val (nSh, nTok) = (r.getInt(0), r.getInt(1))
        // shingle count is exactly max(n_tok - 2, 0)
        assert(nSh == math.max(nTok - 2, 0), s"seed $seed: n_sh=$nSh n_tok=$nTok")
        // 30-bit fingerprint stays in range; token-less rows hash to 0
        // (the query paths exclude them by filter, the kernel is total)
        val fp = r.getLong(2)
        assert(fp >= 0L && fp < (1L << 30), s"seed $seed: fp=$fp")
        if (nTok == 0) assert(fp == 0L, s"seed $seed: empty text fp=$fp")
      }
    }
  }

  test("dot/sq8 kernels match HOF math on generated vectors") {
    import graft.ann.Quantize
    val vec = Gen.listOfN(16, Gen.chooseNum(-2.0f, 2.0f))
    for (seed <- 1L to 8L) {
      val vs = sample(Gen.listOfN(20, vec), seed)
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "embedding")
      val q = vs.head.toSeq
      val native = graft.functions.VectorFunctions.dot(col("embedding"), typedLit(q))
      val hof = graft.functions.VectorFunctions.dotHof(col("embedding"), typedLit(q))
      // identical fold order -> bit-equal doubles, no tolerance needed
      assert(df.select((native === hof).as("ok")).filter(!col("ok")).count() == 0,
        s"seed $seed")
      // sq8: the native codes are bytes — compare through the integer dot
      // against the HOF zip_with form, like KernelEquivalenceSpec
      val (_, qCode) = Quantize.encodeQuery(q)
      val qLong: Seq[Long] = qCode.map(_.toLong).toSeq
      val a = Quantize.encode(df)
        .select(col("id"), Quantize.sq8Dot(col("sq8_code"), lit(qCode)).as("a"))
      val b = df
        .withColumn("_sc", Quantize.sq8Scale(col("embedding")))
        .withColumn("_code", Quantize.sq8EncodeHof(col("embedding"), col("_sc")))
        .select(col("id"), aggregate(
          zip_with(col("_code"), typedLit(qLong), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("b"))
      val diff = a.join(b, Seq("id"), "full")
        .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b")).count()
      assert(diff == 0, s"seed $seed")
    }
  }

  test("Pq.rotate: permutation round-trips and preserves the element multiset") {
    val dim = 16
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f))
    for (seed <- 1L to 6L) {
      // seed-shuffled permutation + its inverse
      val perm = sample(Gen.const(()).flatMap(_ =>
        Gen.pick(dim, 0 until dim).map(_.toList)), seed)
      val inv = new Array[Int](dim)
      perm.zipWithIndex.foreach { case (p, i) => inv(p) = i }
      val df = sample(Gen.listOfN(20, vecGen), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = df.select(col("id"), col("v"),
          graft.ann.Pq.rotate(graft.ann.Pq.rotate(col("v"), perm), inv.toSeq).as("rt"),
          array_sort(col("v")).as("s1"),
          array_sort(graft.ann.Pq.rotate(col("v"), perm)).as("s2"))
      // rotate(inv) ∘ rotate(perm) = identity, and the multiset survives
      assert(out.filter(col("v") =!= col("rt")).count() == 0, s"seed $seed roundtrip")
      assert(out.filter(col("s1") =!= col("s2")).count() == 0, s"seed $seed multiset")
    }
  }
}
