package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing is real — schema, partition sizing, batched
  * per-partition processing (the Scala analogue of `mapInPandas`: one
  * iterator pass per partition, library handles amortized across the
  * batch). The actual codec work is STUBBED behind [[MediaCodec]] because
  * no image/audio libraries exist in this container: [[DeterministicFakeCodec]]
  * derives pseudo-features from the bytes so the pipeline is testable
  * end-to-end; a JNI/JavaCV-backed codec drops in without touching the plan.
  */
object Multimodal {

  case class MediaMeta(mediaId: Long, kind: String, widthPx: Int, heightPx: Int,
                       durationMs: Long, sizeBytes: Long)
  case class MediaFeature(mediaId: Long, kind: String, featureDim: Int,
                          feature: Array[Float], frameCount: Int)

  /** Codec boundary: decode + feature-extract one batch of media blobs.
    * Implementations must be deterministic per byte content. */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    /** Decode a batch (amortize per-partition setup), returning one feature
      * row per input. */
    def extractBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeature]
  }

  /** STUB codec — no media libraries in this environment. Features are a
    * deterministic fold of the raw bytes (stable across runs/engines), so
    * schema, batching, and partitioning are exercised for real while the
    * decode itself is fake. */
  case class DeterministicFakeCodec(featureDim: Int = 8) extends MediaCodec {
    def extractBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeature] =
      rows.map { case (id, kind, bytes) =>
        // integer accumulation (exact), one fp division at the end — makes
        // the fake features bit-reproducible in any engine
        val acc = new Array[Long](featureDim)
        var i = 0
        while (i < bytes.length) {
          acc(i % featureDim) += (bytes(i) & 0xff)
          i += 1
        }
        val n = math.max(bytes.length, 1).toDouble
        MediaFeature(id, kind, featureDim, acc.map(a => (a / 255.0 / n).toFloat),
          frameCount = bytes.length / math.max(featureDim, 1))
      }
  }

  /** Synthesize a deterministic media table from any id-bearing frame:
    * (media_id, kind, blob, size_bytes). Stands in for `spark.read.format
    * ("binaryFile")` in this container. */
  def syntheticMediaTable(ids: DataFrame): DataFrame =
    ids.select(
      col("id").as("media_id"),
      when(col("id") % 3 === 0, "image").when(col("id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      // deterministic pseudo-blob: id-seeded byte sequence
      expr("CAST(concat('blob-', repeat(CAST(id AS STRING), CAST(id % 7 + 1 AS INT))) AS BINARY)")
        .as("blob"))
      .withColumn("size_bytes", length(col("blob")).cast("long"))

  /** The mapInPandas-shaped stage: per-partition batched decode/feature
    * extraction over the blob column. Output schema is fixed and narrow so
    * downstream joins never carry the blobs. */
  def extractFeatures(media: DataFrame, codec: MediaCodec): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(codec.extractBatch _)
  }

  case class MediaFrame(mediaId: Long, frameIdx: Int, frameHash: Long)

  /** Frame-sample stage: every `stride`-th fixed-size frame of each video
    * blob becomes its own row (frame hash = polyHash byte fold) — the
    * flatMap-shaped batch stage (1 input row -> N output rows), the second
    * plumbing shape a real codec needs besides the 1:1 extract. A real
    * decoder replaces the byte-chunk "frames" without touching the plan. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 8,
                   stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          var acc = 0L
          var i = f * frameBytes
          val end = math.min((f + 1) * frameBytes, bytes.length)
          while (i < end) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
          MediaFrame(id, f, acc)
        }
      })
  }

  /** Resize stub: nearest-neighbor subsample of the byte plane to `outLen`
    * bytes (out[j] = in[(j*len)/outLen]), identified by its polyHash fold.
    * Exercises the 1:1 batched transform with a size-changing payload; a
    * real image scaler replaces the byte math only. */
  def resizeImages(media: DataFrame, outLen: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        var acc = 0L
        var j = 0
        while (j < outLen) {
          val src = (j.toLong * bytes.length / outLen).toInt
          acc = (acc * 31 + (bytes(src) & 0xff)) % 1000000007L
          j += 1
        }
        (id, outLen, acc)
      })
      .toDF("media_id", "out_len", "resized_hash")
  }

  case class MediaPatch(mediaId: Long, patchRow: Int, patchCol: Int,
                        nPx: Int, patchHash: Long)

  /** ViT-style patchification (Dosovitskiy '20 "An Image is Worth 16x16
    * Words", public): the decoded pixel plane splits into a grid of
    * P×P patches, one output row per patch with its grid position — the
    * transform that turns an image table into a training-token table.
    * The third batched plumbing shape next to extract (1:1) and
    * frame-sample (1:N flat): 1 image → a 2-D indexed grid.
    *
    * Fake geometry under the stub codec: the blob is a row-major byte
    * plane of width [[PatchPlaneW]]; a real decoder supplies real pixels
    * and this function's plan (schema, batching, grid math) is unchanged.
    * Patches overhanging the plane's tail keep their in-bounds pixels
    * (n_px < P²); fully-empty patches are not emitted. Patch identity is
    * the polyHash fold of its pixels in row-major order. */
  val PatchPlaneW = 8

  def patchify(media: DataFrame, patch: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val w = PatchPlaneW
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val n = bytes.length
        val h = (n + w - 1) / w
        val prMax = (h + patch - 1) / patch
        val pcMax = (w + patch - 1) / patch
        for {
          pr <- (0 until prMax).iterator
          pc <- 0 until pcMax
          res = {
            var acc = 0L; var px = 0
            var r = pr * patch
            while (r < math.min((pr + 1) * patch, h)) {
              var c = pc * patch
              while (c < math.min((pc + 1) * patch, w)) {
                val p = r * w + c
                if (p < n) { acc = (acc * 31 + (bytes(p) & 0xff)) % 1000000007L; px += 1 }
                c += 1
              }
              r += 1
            }
            (px, acc)
          }
          if res._1 > 0
        } yield MediaPatch(id, pr, pc, res._1, res._2)
      })
      .toDF("media_id", "patch_row", "patch_col", "n_px", "patch_hash")
  }

  /** Cross-modal near-duplicate join (r16 verdict #7 — the multimodal
    * tier had per-modality features but no CROSS-modal operator): the
    * CLIP-retrieval shape (Radford '21 — two modality encoders into one
    * shared d-dim space, candidates by bucket, exact verify; public) with
    * both encoders honestly stubbed: the text leg runs the SAME
    * [[MediaCodec]] byte fold over the document's UTF-8 bytes that the
    * media leg runs over the blob, so the shared space is real plumbing
    * with fake semantics — a real CLIP text/image tower drops in at the
    * codec seam without touching the plan.
    *
    * Scale shape — never all-pairs: candidates come from a JOINT BUCKET
    * equi-join on (argmax dim, argmin dim) of the feature vector (first
    * index wins ties — `array_position` semantics, replayed exactly by
    * the oracle's `list_position`), ≤ d(d−1) buckets, then exact cosine
    * verifies ≥ `minSim` on the 6dp-ROUNDED score (the cut itself is
    * SQL-replayable). With a real signed encoder the bucket generalizes
    * to the SimHash sign pattern (2^d buckets — [[graft.dedup.SimHash]]'s
    * machinery); the fake fold's features are non-negative, which
    * degenerates sign buckets, so the extrema pair stands in. Output:
    * (doc_id, media_id, kind, sim), ordered. */
  def crossModalNearDup(docs: DataFrame, media: DataFrame, codec: MediaCodec,
                        minSim: Double = 0.985): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val textFeat = docs.select(col("id"), col("text")).as[(Long, String)]
      .mapPartitions(it => codec.extractBatch(it.map { case (id, t) =>
        (id, "text", t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }))
      .toDF().select(col("mediaId").as("doc_id"),
        col("feature").cast("array<double>").as("tf"))
    val mediaFeat = extractFeatures(media, codec)
      .toDF().select(col("mediaId").as("media_id"), col("kind"),
        col("feature").cast("array<double>").as("mf"))
    def bucketed(df: DataFrame, f: String): DataFrame = df
      .withColumn("bmax", array_position(col(f), array_max(col(f))))
      .withColumn("bmin", array_position(col(f), array_min(col(f))))
    val sim = round(
      graft.functions.VectorFunctions.dot(col("tf"), col("mf")) /
        (sqrt(graft.functions.VectorFunctions.dot(col("tf"), col("tf"))) *
          sqrt(graft.functions.VectorFunctions.dot(col("mf"), col("mf")))), 6)
    bucketed(textFeat, "tf").join(bucketed(mediaFeat, "mf"), Seq("bmax", "bmin"))
      .withColumn("sim", sim)
      .filter(col("sim") >= minSim)
      .select(col("doc_id"), col("media_id"), col("kind"), col("sim"))
      .orderBy("doc_id", "media_id")
  }

  /** Feature checksum projection (oracle-able scalar per media row);
    * rounding happens in the plan so the SQL oracle's round() matches. */
  def featureChecksums(features: Dataset[MediaFeature]): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f =>
        (f.mediaId, f.kind, f.featureDim,
          f.feature.zipWithIndex.map { case (v, i) => v.toDouble * (i + 1) }.sum))
      .toDF("media_id", "kind", "feature_dim", "checksum")
      .withColumn("checksum", round(col("checksum"), 6))
  }
}
