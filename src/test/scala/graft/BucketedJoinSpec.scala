package graft

import org.apache.spark.sql.functions._
import graft.core.{Corpus, Tables}
import graft.sources.Bucketed

/** The co-located-join contract: two tables bucketed on the same key with
  * the same bucket count must join with NO Exchange on either side — the
  * physical proof that the storage layout, not a per-query repartition,
  * carries the partitioning at 100 TB. */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketing join plans with zero exchanges") {
    val mem = Corpus.memories(spark, sf()).select("id", "source", "category")
    val fb = Corpus.searchFeedback(spark, sf())
      .groupBy(col("memory_id").as("id"))
      .agg(sum(when(col("signal") === "useful", 1).otherwise(-1)).as("net"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.save(mem, "b_memories", "id", 8)
      Bucketed.save(fb, "b_feedback", "id", 8)
      // at fixture scale the planner would broadcast (both sides tiny) and
      // never consult the bucketing; disabling broadcast simulates the
      // 100 TB regime where both sides are too big to ship
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = Bucketed.load(spark, "b_memories")
        .join(Bucketed.load(spark, "b_feedback"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val viaPlain = mem.join(fb, "id").count()
      assert(joined.count() == viaPlain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketed.drop(spark, "b_memories"); Bucketed.drop(spark, "b_feedback")
    }
  }

  test("bucketed scan prunes columns like a plain parquet scan") {
    try {
      Bucketed.save(Tables.documents(spark, sf()), "b_docs", "doc_id", 4)
      val plan = Bucketed.load(spark, "b_docs").select("doc_id", "lang")
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
        s"column pruning lost through the bucketed table:\n$plan")
    } finally Bucketed.drop(spark, "b_docs")
  }
}
