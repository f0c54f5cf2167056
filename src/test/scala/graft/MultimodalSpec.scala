package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, per-partition batching, deterministic fake
  * codec (real decode is stubbed — no media libs in this container). */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("fake codec features are deterministic and partition-invariant") {
    val ids = (0L until 50L).toDF("id")
    val media = Multimodal.syntheticMediaTable(ids)
    val c1 = Multimodal.featureChecksums(
      Multimodal.extractFeatures(media.repartition(1), Multimodal.DeterministicFakeCodec()))
      .orderBy("media_id").collect().map(_.toString)
    val c8 = Multimodal.featureChecksums(
      Multimodal.extractFeatures(media.repartition(8), Multimodal.DeterministicFakeCodec()))
      .orderBy("media_id").collect().map(_.toString)
    assert(c1.toSeq == c8.toSeq)
  }

  test("feature rows carry fixed dim and kind partitioning") {
    val media = Multimodal.syntheticMediaTable((0L until 9L).toDF("id"))
    val feats = Multimodal.extractFeatures(media, Multimodal.DeterministicFakeCodec(8))
    val kinds = feats.toDF().groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(kinds == Map("image" -> 3L, "audio" -> 3L, "video" -> 3L))
    assert(feats.collect().forall(_.feature.length == 8))
  }

  test("patchify: hand-checked grid, tail clipping, and partition invariance") {
    // a 10-byte plane at width 8: h = 2, one patch band, two patch cols.
    // patch (0,0) = rows 0-1 x cols 0-3 -> bytes 0,1,2,3,8,9 (6 px);
    // patch (0,1) = cols 4-7 -> bytes 4..7 only (row 1 clipped, 4 px)
    val bytes = "abcdefghij".getBytes("UTF-8")
    val media = Seq((0L, "image", bytes)).toDF("media_id", "kind", "blob")
    def poly(bs: Seq[Byte]) =
      bs.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    val got = Multimodal.patchify(media)
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(r => (r._2, r._3))
    assert(got.toSeq == Seq(
      (0L, 0, 0, 6, poly(Seq(0, 1, 2, 3, 8, 9).map(bytes(_)))),
      (0L, 0, 1, 4, poly(Seq(4, 5, 6, 7).map(bytes(_))))))
    // non-images are ignored; the grid is partition-invariant
    val mixed = Multimodal.syntheticMediaTable((0L until 30L).toDF("id"))
    val p1 = Multimodal.patchify(mixed.repartition(1))
      .orderBy("media_id", "patch_row", "patch_col").collect().map(_.toString)
    val p7 = Multimodal.patchify(mixed.repartition(7))
      .orderBy("media_id", "patch_row", "patch_col").collect().map(_.toString)
    assert(p1.toSeq == p7.toSeq && p1.nonEmpty)
  }

  test("cross-modal near-dup: joint-bucket candidates only, verified rounded cut (r16 verdict #7)") {
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id").as("id"), col("text"))
    val media = Multimodal.syntheticMediaTable(docs.select("id"))
    val codec = Multimodal.DeterministicFakeCodec()
    val out = Multimodal
      .crossModalNearDup(docs, media, codec)
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(out.nonEmpty, "the fixture corpus must yield cross-modal pairs")
    assert(out.forall(_._4 >= 0.985), "every pair clears the rounded cut")
    // bucket invariant on a sample: a returned pair MUST share the joint
    // (argmax, argmin) bucket — recomputed here straight through the raw
    // codec fold, independent of the Spark plan
    def feat(kind: String, bytes: Array[Byte]): Array[Float] =
      codec.extractBatch(Iterator((0L, kind, bytes))).next().feature
    def buckets(f: Array[Float]): (Int, Int) =
      (f.indexOf(f.max), f.indexOf(f.min))
    val textById = docs.as[(Long, String)].collect().toMap
    out.take(5).foreach { case (docId, mediaId, _, _) =>
      val tb = buckets(feat("text", textById(docId).getBytes("UTF-8")))
      val blob = ("blob-" + (mediaId.toString * (mediaId % 7 + 1).toInt)).getBytes("UTF-8")
      val mb = buckets(feat("blob", blob))
      assert(tb == mb, s"pair ($docId, $mediaId) must share the joint bucket: $tb vs $mb")
    }
    // determinism: a repartitioned run returns the identical pair set
    val out2 = Multimodal
      .crossModalNearDup(docs.repartition(7), media.repartition(3), codec)
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(out2 == out)
  }

  test("blobs never flow past the feature stage (narrow output schema)") {
    val media = Multimodal.syntheticMediaTable((0L until 4L).toDF("id"))
    val out = Multimodal.featureChecksums(
      Multimodal.extractFeatures(media, Multimodal.DeterministicFakeCodec()))
    assert(out.columns.toSeq == Seq("media_id", "kind", "feature_dim", "checksum"))
  }
}
