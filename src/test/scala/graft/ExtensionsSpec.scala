package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, FunctionBridge}
import graft.expressions._

/** The SQL function surface: every registered kernel callable from
  * spark.sql and bit-equal to its Column form. */
class ExtensionsSpec extends SparkSpec {

  private def kernel(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnBridge.column(e)
  private def ex(c: org.apache.spark.sql.Column) = ColumnBridge.expression(c)

  test("every text kernel is callable from SQL and matches its Column form") {
    FunctionBridge.register(spark)
    val docs = core.Tables.documents(spark, sf()).select("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_poly_hash(text) AS ph,
        |  graft_shingle_hashes(text, 3) AS sh,
        |  graft_shingles(text, 2) AS sg,
        |  graft_minhash_sig(graft_shingle_hashes(text, 3), 32) AS mh,
        |  graft_term_freqs(text) AS tf,
        |  graft_simhash(text, 30) AS sf,
        |  graft_winnow_select(graft_shingle_hashes(text, 3), 4) AS ws,
        |  graft_winnow_positions(graft_shingle_hashes(text, 3), 4) AS wp,
        |  graft_hash_embed(text, 64) AS he
        |FROM ext_docs""".stripMargin)
    val sh = ShingleHashes(ex(col("text")), 3)
    val viaColumns = docs.select(col("doc_id"),
      kernel(PolyHash(ex(col("text")))).as("ph"),
      kernel(sh).as("sh"),
      kernel(Shingles(ex(col("text")), 2)).as("sg"),
      kernel(MinHashSig(sh, 32)).as("mh"),
      kernel(TermFreqs(ex(col("text")))).as("tf"),
      kernel(SimHashFp(ex(col("text")), 30)).as("sf"),
      kernel(WinnowSelect(sh, 4)).as("ws"),
      kernel(WinnowPositions(sh, 4)).as("wp"),
      kernel(HashEmbed(ex(col("text")), 64)).as("he"))
    assert(viaSql.exceptAll(viaColumns).count() == 0 &&
      viaColumns.exceptAll(viaSql).count() == 0)
  }

  test("vector kernels (dot, jaccard, sq8) are callable from SQL") {
    FunctionBridge.register(spark)
    core.Tables.embeddings(spark, sf()).createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
        |  round(graft_dot(a.embedding, b.embedding), 6) AS d,
        |  graft_sq8_dot(graft_sq8_encode(a.embedding, 1.0),
        |                graft_sq8_encode(b.embedding, 1.0)) AS q
        |FROM ext_emb a JOIN ext_emb b ON a.vec_id + 1 = b.vec_id""".stripMargin)
    val emb = core.Tables.embeddings(spark, sf())
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val viaColumns = a.join(b, col("ia") + 1 === col("ib"))
      .select(col("ia"), col("ib"),
        round(graft.functions.VectorFunctions.dot(col("ea"), col("eb")), 6).as("d"),
        kernel(Sq8Dot(
          ex(graft.ann.Quantize.sq8Encode(col("ea"), lit(1.0))),
          ex(graft.ann.Quantize.sq8Encode(col("eb"), lit(1.0))))).as("q"))
    assert(viaSql.exceptAll(viaColumns).count() == 0 &&
      viaColumns.exceptAll(viaSql).count() == 0)
  }

  test("non-literal kernel parameters are rejected") {
    FunctionBridge.register(spark)
    core.Tables.documents(spark, sf()).limit(5)
      .createOrReplaceTempView("ext_docs_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(text, CAST(n_chars AS INT)) FROM ext_docs_bad")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("fractional kernel parameters are rejected as a clean planning error") {
    FunctionBridge.register(spark)
    core.Tables.documents(spark, sf()).limit(5)
      .createOrReplaceTempView("ext_docs_frac")
    // DECIMAL literal: must be the require message, not a ClassCastException
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash(text, 2.5) FROM ext_docs_frac").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
    // DOUBLE literal: must not silently truncate 2.9 -> 2
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_simhash(text, CAST('2.9' AS DOUBLE)) FROM ext_docs_frac")
        .collect()
    }
    assert(err2.getMessage.contains("integer literal"), err2.getMessage)
    // whole-valued DECIMAL and DOUBLE both work through the same widening
    // path (uniform contract: wholeness decides, not the literal's type)
    val ok = spark.sql(
      "SELECT graft_simhash(text, CAST(2 AS DECIMAL(4,1))) FROM ext_docs_frac")
      .collect()
    assert(ok.length == 5)
    val ok2 = spark.sql(
      "SELECT graft_simhash(text, CAST('2' AS DOUBLE)) FROM ext_docs_frac")
      .collect()
    assert(ok2.length == 5)
  }

  test("the extensions hook applies cleanly at session-builder level") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must inject all functions without throwing
  }
}
