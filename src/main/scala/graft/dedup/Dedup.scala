package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot

/** D1-D3, D8: exact + embedding-cosine near-duplicate detection
  * (reference memory_engine.py:2187-2272, 2564-2637).
  *
  * The exact-pairs path mirrors the reference's dense `E·Eᵀ` with its
  * per-row top-5-neighbor restriction, expressed as a similarity self-join +
  * rank window. At 100 TB the self-join is replaced by the LSH candidate
  * generators ([[MinHashLsh]], [[SimHash]]) feeding the same verify/execute
  * stages — candidate generation is the only scale-sensitive stage.
  */
object Dedup {

  /** Exact duplicate removal: group by a key (default `text`), keep the
    * lowest id of each group. Returns the surviving rows. */
  def dedupExact(df: DataFrame, keyCol: String = "text", idCol: String = "id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** D2: near-duplicate pairs by embedding cosine — per-row top-`searchK`
    * neighbors, threshold, deduped unordered pair key, sim rounded to 4
    * (memory_engine.py:2199-2237). Output: (id_a, id_b, similarity) with
    * id_a < id_b, sorted by similarity desc. */
  def findDuplicates(df: DataFrame, threshold: Double = 0.90, searchK: Int = 5): DataFrame = {
    // the non-equi self-join plans as a broadcast nested loop whose
    // parallelism is the STREAM side's partitioning — a single parquet
    // footer would run the whole O(n²) scoring on one core
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.select(col("id").as("ia"), col("embedding").as("ea")).repartition(nPart)
    val b = df.select(col("id").as("ib"), col("embedding").as("eb"))
    // O(n²) scored join; at scale swap in an LSH candidate set before scoring
    // rounded before ranking so neighbor order is reproducible cross-engine;
    // project the embeddings away BEFORE the rank shuffle — at n=10⁵+ the
    // pair stream is quadratic and must stay narrow (ids + one double)
    val scored = a.join(b, col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), round(dot(col("ea"), col("eb")), 6).as("sim"))
    val w = Window.partitionBy("ia").orderBy(desc("sim"), asc("ib"))
    scored
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= searchK)
      .filter(col("sim") >= threshold)
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        round(col("sim"), 4).as("similarity"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(desc("similarity"), asc("id_a"), asc("id_b"))
  }

  /** D3: dedup execution — remove the higher id of each duplicate pair,
    * keeping the earliest entry (memory_engine.py:2239-2272). Returns
    * surviving rows of `df`. */
  def deduplicate(df: DataFrame, threshold: Double = 0.90): DataFrame = {
    val remove = findDuplicates(df, threshold).select(col("id_b").as("id")).distinct()
    df.join(remove, Seq("id"), "left_anti")
  }

  /** D8: smart-import three-band resolution (memory_engine.py:2564-2637).
    * For each incoming row, compare against its best match in `existing`:
    * sim ≥ skip band → "skip"; sim < add band → "add"; otherwise newer
    * timestamp wins → "replace" or "skip_older". */
  def smartImportActions(incoming: DataFrame, existing: DataFrame,
                         skipThreshold: Double = 0.95,
                         addThreshold: Double = 0.80): DataFrame = {
    val inc = incoming.select(col("id").as("in_id"), col("embedding").as("in_emb"),
      col("created_at").as("in_ts"))
    val ex = existing.select(col("id").as("ex_id"), col("embedding").as("ex_emb"),
      col("created_at").as("ex_ts"))
    val scored = inc.join(ex, col("in_id") =!= col("ex_id"))
      .select(col("in_id"), col("ex_id"), col("in_ts"), col("ex_ts"),
        round(dot(col("in_emb"), col("ex_emb")), 6).as("sim"))
    val w = Window.partitionBy("in_id").orderBy(desc("sim"), asc("ex_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(
        col("in_id").as("id"), col("ex_id").as("match_id"), col("sim"),
        when(col("sim") >= skipThreshold, "skip")
          .when(col("sim") < addThreshold, "add")
          .when(col("in_ts") > col("ex_ts"), "replace")
          .otherwise("skip_older").as("action"))
  }
}
