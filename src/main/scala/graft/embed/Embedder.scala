package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** E1/E2: embedding stage. The reference embeds with a local ONNX
  * all-MiniLM-L6-v2 (onnx_embedder.py:80-147: tokenize→forward→mean-pool→L2
  * normalize, batches of 64). Model inference is environment-dependent, so
  * the engine is built around a provider trait; the default provider is a
  * deterministic hashing projection that is exactly reproducible in SQL —
  * which is what the correctness harness needs — while a real ONNX/DJL
  * `mapPartitions` provider (one session per partition, batched input, the
  * direct analogue of the reference's batching) can drop in unchanged.
  */
trait Embedder {
  def dim: Int
  /** Add an `embedding: array<float>` column derived from `textCol`. */
  def embed(df: DataFrame, textCol: String = "text"): DataFrame
}

/** Deterministic hashing-projection embedder: token → polyHash → bucket
  * (hash mod dim) with ±1 sign from the hash's parity bit, tf-weighted,
  * L2-normalized — a signed feature-hashing projection (Weinberger '09).
  * Pure column expressions: codegen-friendly and DuckDB-reproducible. */
case class HashingEmbedder(dim: Int = 64) extends Embedder {

  /** bucket = polyHash(token) % dim; sign from (hash/dim) parity; tf-summed
    * then L2-normalized. Backed by the one-pass codegen'd
    * [[graft.expressions.HashEmbed]] kernel. */
  def embeddingColumn(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HashEmbed(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), dim))

  def embed(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("embedding", embeddingColumn(col(textCol)))
}

/** A model session that encodes one batch of texts — the boundary a real
  * ONNX/DJL runtime (or a remote embedding API, E3) implements. Sessions
  * are created per partition and reused across batches, matching the
  * reference's provider structure (onnx_embedder.py:80-147 loads the model
  * once and feeds batches of 64; openai_embedder.py batches requests). */
trait ModelSession {
  def dim: Int
  def encode(batch: Seq[String]): Seq[Array[Float]]
}

/** E1/E3 provider shape: `mapPartitions` with one session per partition and
  * fixed-size batches — the plumbing a model-backed embedder needs (session
  * amortized across the partition, bounded batch memory), independent of
  * which model backs [[ModelSession]]. `DeterministicFakeSession` (the
  * hashing projection) stands in for ONNX in this environment; swapping in
  * a real runtime touches only the session factory, never the plan. */
case class SessionEmbedder(newSession: () => ModelSession, batchSize: Int = 64)
    extends Embedder {
  lazy val dim: Int = newSession().dim
  def embed(df0: DataFrame, textCol: String = "text"): DataFrame = {
    val df = df0.drop("embedding") // replaced below; avoids a duplicate name
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    val withText = df.withColumn("__t", col(textCol).cast("string"))
    val schema = org.apache.spark.sql.types.StructType(
      withText.schema.fields.dropRight(1) :+
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val out = withText.mapPartitions({ rows =>
      val session = newSession() // one model load per partition
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = session.encode(batch.map(_.getAs[String]("__t")))
        batch.lazyZip(vecs).map { (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1) :+ v.toSeq)
        }
      }
    })(enc)
    out.select((cols.filterNot(_ == "embedding") :+ "embedding").map(col): _*)
  }
}

/** The stand-in session: the same deterministic hashing projection as
  * [[HashingEmbedder]], computed batch-wise — so SessionEmbedder's output
  * is pinned to the column-expression embedder bit for bit. */
case class DeterministicFakeSession(dim: Int = 64) extends ModelSession {
  def encode(batch: Seq[String]): Seq[Array[Float]] =
    batch.map { t =>
      val arr = graft.expressions.TextKernels
        .hashEmbed(org.apache.spark.unsafe.types.UTF8String.fromString(t), dim)
      arr.toFloatArray()
    }
}

/** E2: batch re-embed — recompute the embedding column for the whole table
  * and atomically swap (embed BEFORE any destructive replace,
  * memory_engine.py:319-363, 2887-2971). */
object Reembed {
  def reembedAll(memories: org.apache.spark.sql.DataFrame, embedder: Embedder,
                 targetPath: String): Long =
    graft.sources.Store.save(embedder.embed(memories.drop("embedding")), targetPath)
}

object OracleEmbed {
  /** DuckDB expression mirroring [[HashingEmbedder.embeddingColumn]] as a
    * DOUBLE list (callers compare dot products, so float casting is not
    * needed as long as both sides round). */
  def sql(textExpr: String, dim: Int = 64): String = {
    val toks = s"list_filter(string_split_regex(lower($textExpr), '\\s+'), x -> len(x) > 0)"
    val hashes = s"list_transform($toks, t -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % 1000000007))"
    val raw = s"list_transform(range(0, $dim), i -> list_sum(list_transform($hashes, h -> CASE WHEN h % $dim = i THEN CASE WHEN (h // $dim) % 2 = 0 THEN 1.0 ELSE -1.0 END ELSE 0.0 END)))"
    s"""(SELECT CASE WHEN nrm > 0 THEN list_transform(r, x -> x / nrm) ELSE list_transform(r, x -> 0.0) END
       | FROM (SELECT $raw AS r) t1, (SELECT sqrt(list_sum(list_transform(r2, x -> x*x))) AS nrm FROM (SELECT $raw AS r2)) t2)""".stripMargin
  }
}
