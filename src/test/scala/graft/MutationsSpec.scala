package graft

import org.apache.spark.sql.functions._
import graft.ops.Mutations

/** Pins the withSeqId invariant: ids are the exact global row_number by the
  * sort key, computed from ONE materialized range partitioning (the counts
  * job and the offsets join must see identical boundaries — see
  * Mutations.withSeqId). */
class MutationsSpec extends SparkSpec {

  test("withSeqId runs its range partitioning once: ids = global row_number") {
    import spark.implicits._
    // skewed keys + shuffled input order across many input partitions, so a
    // boundary divergence between two partitioning executions would misplace
    // offsets and break contiguity
    val n = 5000
    val rows = (0 until n).map { i =>
      (s"t${i % 7}", s"src${(i * 2654435761L % 97).toInt}", i)
    }
    val df = spark.createDataFrame(scala.util.Random.shuffle(rows))
      .toDF("text", "source", "payload")
      .repartition(13)

    val out = Mutations.addMemories(df, maxId = 1000L)
      .select("id", "text", "source").cache()

    val ids = out.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1001L to 1000L + n))

    // id order must equal (text, source) sort order (ties arbitrary but
    // both columns must be non-decreasing along ids)
    val sortedByKey = out.orderBy("id").select("text", "source")
      .as[(String, String)].collect()
    assert(sortedByKey.toSeq == sortedByKey.toSeq.sorted)
    out.unpersist()
  }

  test("addMemories is deterministic across invocations") {
    import spark.implicits._
    // unique keys: with ties the id assignment among tied rows is
    // legitimately arbitrary; the contract is exact only on distinct keys
    val df = spark.createDataFrame(
      (0 until 1000).map(i => (s"text-${(i * 37) % 1000}", s"s${i % 5}", i)))
      .toDF("text", "source", "payload").repartition(7)
    val a = Mutations.addMemories(df, 0L).select("payload", "id")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    val b = Mutations.addMemories(df, 0L).select("payload", "id")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
