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

  test("blobs never flow past the feature stage (narrow output schema)") {
    val media = Multimodal.syntheticMediaTable((0L until 4L).toDF("id"))
    val out = Multimodal.featureChecksums(
      Multimodal.extractFeatures(media, Multimodal.DeterministicFakeCodec()))
    assert(out.columns.toSeq == Seq("media_id", "kind", "feature_dim", "checksum"))
  }
}
