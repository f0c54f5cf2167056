package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.embed.HashingEmbedder
import graft.functions.{TextFunctions, VectorFunctions}

/** The native codegen kernels must be bit-identical to the declarative
  * higher-order-function formulations they replaced (which the DuckDB
  * oracles mirror). Checked over the real sf0.001 corpus. */
class KernelEquivalenceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf()).limit(200)

  // the original HOF formulations, kept here as the specification
  private def hofPolyHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => (acc * TextFunctions.HashMul + ascii(c)) % TextFunctions.HashMod)

  private def hofShingleHashes(text: Column, n: Int): Column =
    transform(TextFunctions.shinglesHof(text, n), s => hofPolyHash(s))

  private def hofEmbed(text: Column, dim: Int): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => hofPolyHash(t))
    val raw = transform(sequence(lit(0), lit(dim - 1)), i =>
      aggregate(hashes, lit(0.0), (acc, h) =>
        acc + when(pmod(h, lit(dim)) === i,
          when(pmod(floor(h / lit(dim)), lit(2)) === 0, 1.0).otherwise(-1.0)).otherwise(0.0)))
    val norm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    when(norm > 0, transform(raw, x => (x / norm).cast("float")))
      .otherwise(transform(raw, x => lit(0.0f)))
  }

  test("native polyHash == HOF polyHash") {
    val diff = docs.select(
        TextFunctions.polyHash(col("text")).as("a"), hofPolyHash(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native shingleHashes == HOF shingleHashes") {
    val diff = docs.select(
        TextFunctions.shingleHashes(col("text"), 3).as("a"),
        hofShingleHashes(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native shingles == HOF shingles (incl. short-doc empty arrays)") {
    for (n <- Seq(2, 3, 8)) {
      val diff = docs.select(
          TextFunctions.shingles(col("text"), n).as("a"),
          TextFunctions.shinglesHof(col("text"), n).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"n=$n")
    }
    // sub-n-token edge: both forms must yield the empty array, not null
    val edge = Seq("one", "two words", "", "  ").toDF("text")
    val d2 = edge.select(
        TextFunctions.shingles(col("text"), 3).as("a"),
        TextFunctions.shinglesHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b") || col("a").isNull).count()
    assert(d2 == 0)
  }

  test("native hashEmbed == HOF embedding column") {
    val diff = docs.select(
        HashingEmbedder(64).embeddingColumn(col("text")).as("a"),
        hofEmbed(col("text"), 64).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  private def hofMinHashSig(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, x =>
        pmod(x * (i * 2 + 1) + i * lit(7919L) + 13, lit(TextFunctions.HashMod)))))

  test("native minHashSig == HOF signature") {
    val sh = graft.dedup.MinHashLsh.shingleSets(docs.withColumnRenamed("doc_id", "id"))
    val diff = sh.select(
        TextFunctions.minHashSig(col("sh"), 32).as("a"),
        hofMinHashSig(col("sh"), 32).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native jaccardSim == HOF intersect/union ratio") {
    val sh = graft.dedup.MinHashLsh.shingleSets(docs.withColumnRenamed("doc_id", "id")).limit(60)
    val pairs = sh.select(col("sh").as("x"))
      .crossJoin(sh.select(col("sh").as("y")).limit(15))
    val diff = pairs.select(
        TextFunctions.jaccardSim(col("x"), col("y")).as("a"),
        (size(array_intersect(col("x"), col("y"))).cast("double") /
          size(array_union(col("x"), col("y")))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native winnowSelect == HOF winnowing fingerprint") {
    // real corpus plus the short-input edges (n==0, 0<n<w)
    val edge = Seq("", "one two three", "a b c d e").toDF("text")
    for (frame <- Seq(docs.select("text"), edge)) {
      val diff = frame.select(
          graft.text.TextAnalysis.winnowingFingerprint(col("text")).as("a"),
          graft.text.TextAnalysis.winnowingFingerprintHof(col("text")).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0)
    }
  }

  test("native winnowPositions == HOF positioned winnowing") {
    // real corpus plus edges: ties (repeated tokens force equal shingle
    // hashes, exercising the rightmost-minimum rule) and short inputs
    val edge = Seq("", "one two three",
      "a b a b a b a b", "x x x x x x x x x x").zipWithIndex
      .map { case (t, i) => (i.toLong + 100000L, t) }.toDF("id", "text")
    for (frame <- Seq(docs.select(col("doc_id").as("id"), col("text")), edge)) {
      val a = graft.text.TextAnalysis.winnowedPositions(frame)
      val b = graft.text.TextAnalysis.winnowedPositionsHof(frame)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
  }

  test("native termFreqs == declarative explode/groupBy term frequencies") {
    val d = docs.withColumnRenamed("doc_id", "id")
    val a = graft.search.BM25.termFreqs(d)
    val b = graft.search.BM25.termFreqsDeclarative(d)
      .select(col("id"), col("term"), col("tf").as("tf_b"))
    val diff = a.join(b, Seq("id", "term"), "full")
      .filter(col("tf").isNull || col("tf_b").isNull || col("tf") =!= col("tf_b"))
      .count()
    assert(diff == 0)
  }

  test("native simHash == declarative explode/groupBy fingerprints") {
    val d = docs.withColumnRenamed("doc_id", "id")
    val diff = graft.dedup.SimHash.fingerprints(d).as("a")
      .join(graft.dedup.SimHash.fingerprintsDeclarative(d).as("b"), Seq("id"), "full")
      .filter(col("a.simhash").isNull || col("b.simhash").isNull ||
        col("a.simhash") =!= col("b.simhash")).count()
    assert(diff == 0)
  }

  test("session-per-partition batched embedder == column-expression embedder") {
    import graft.embed.{DeterministicFakeSession, HashingEmbedder, SessionEmbedder}
    val d = docs.withColumnRenamed("doc_id", "id").select("id", "text")
    // batchSize 7 forces multiple batches per partition (batch-boundary pin)
    val a = SessionEmbedder(() => DeterministicFakeSession(64), batchSize = 7)
      .embed(d).select(col("id"), col("embedding").as("ea"))
    val b = HashingEmbedder(64).embed(d)
      .select(col("id"), col("embedding").as("eb"))
    val diff = a.join(b, Seq("id"), "full")
      .filter(col("ea").isNull || col("eb").isNull || col("ea") =!= col("eb"))
      .count()
    assert(diff == 0)
  }

  test("native dot == HOF dot on real embeddings") {
    val e = Tables.embeddings(spark, sf()).limit(100)
    val pairs = e.select(col("embedding").as("x"))
      .crossJoin(e.select(col("embedding").as("y")).limit(10))
    val diff = pairs.select(
        VectorFunctions.dot(col("x"), col("y")).as("a"),
        VectorFunctions.dotHof(col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("retrieval plan quality: pushdown + top-k, codegen'd dot") {
    val mem = graft.core.Corpus.memories(spark, sf())
    val qv = Queries.queryVec(spark, sf())
    val plan = graft.search.VectorSearch
      .topK(mem, qv, 10, sourcePrefix = Some("src1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(source), StringStartsWith(source,src1)"),
      s"source filter not pushed to parquet:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("CodegenFallback"))
  }

  test("native sq8 encode/dot == declarative floor + zip_with forms") {
    import graft.ann.Quantize
    val embs = Tables.embeddings(spark, sf()).limit(200)
      .withColumnRenamed("vec_id", "id")
    val q = embs.filter(col("id") === 0).select("embedding").head().getSeq[Float](0)
    val (_, qCode) = Quantize.encodeQuery(q)
    val qCodesLong: Seq[Long] = qCode.map(_.toLong).toSeq
    val native = Quantize.encode(embs)
      .select(col("id"), Quantize.sq8Dot(col("sq8_code"), lit(qCode)).as("a"))
    val decl = embs
      .withColumn("_sc", Quantize.sq8Scale(col("embedding")))
      .withColumn("_code", Quantize.sq8EncodeHof(col("embedding"), col("_sc")))
      .select(col("id"), aggregate(
        zip_with(col("_code"), typedLit(qCodesLong), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("b"))
    val diff = native.join(decl, Seq("id"), "full")
      .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b")).count()
    assert(diff == 0)
  }
}
