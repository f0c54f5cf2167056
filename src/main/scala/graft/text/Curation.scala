package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHashLsh}
import graft.functions.TextFunctions

/** End-to-end training-data curation pipeline over an (id, text) corpus —
  * the composition a 100 TB pre-training data run would execute:
  *
  *   profile (language-ID + quality + token counts, [[TextAnalysis]])
  *     → threshold filter (target language, min quality, min tokens)
  *     → exact dedup on whitespace-normalized text ([[Dedup.dedupExact]])
  *     → MinHash-LSH near-dup removal ([[MinHashLsh.nearDuplicates]],
  *       drop the higher id of each pair — D3 semantics,
  *       reference memory_engine.py:2239-2272).
  *
  * Scale shape: the profile stage is pure codegen column math fused into the
  * scan (one pass, no shuffle); the filter prunes before anything shuffles;
  * exact dedup is one hash-partitioned window on the normalized key; the
  * near-dup stage shuffles only (band, key) buckets — the quadratic pair
  * space never materializes. Nothing collects to the driver.
  */
object Curation {

  /** The pipeline's stage frames, exposed for funnel metrics and audits. */
  case class Stages(profiled: DataFrame, kept: DataFrame, exact: DataFrame,
                    pairs: DataFrame, survivors: DataFrame)

  /** Profile stage alone (lazy, no jobs triggered): per-row language,
    * quality, token counts. Rows whose text has no tokens are dropped
    * (un-profileable). */
  def profile(docs: DataFrame): DataFrame = {
    val li = TextAnalysis.langId(col("text"))
    val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
    docs
      .filter(size(TextFunctions.tokens(col("text"))) > 0)
      .select(col("id"), col("text"),
        li.getField("lang").as("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        ws.as("n_ws"), bpe.as("n_bpe"))
  }

  /** Run the pipeline. `docs` needs (id, text). NOTE: the near-dup stage
    * materializes its shingle frame eagerly (checkpoint), so calling this
    * runs jobs; use [[profile]] for profile-only consumers. */
  def curate(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
             minTokens: Int = 10, jaccardThreshold: Double = 0.2): Stages = {
    val profiled = profile(docs)
    val kept = profiled.filter(
      col("lang") === lang && col("quality") >= minQuality && col("n_ws") >= minTokens)
    val exact = Dedup.dedupExact(
      kept.withColumn("_norm", array_join(TextFunctions.tokens(col("text")), " ")),
      keyCol = "_norm").drop("_norm")
    val pairs = MinHashLsh.nearDuplicates(exact, jaccardThreshold)
    val survivors = exact.join(
      pairs.select(col("id_b").as("id")).distinct(), Seq("id"), "left_anti")
    Stages(profiled, kept, exact, pairs, survivors)
  }

  /** Deterministic per-source-prefix downsampling: keep a row iff
    * lcg(id) mod 2^31 < rate(source) · 2^31, where rate is the first
    * matching prefix in `rates` (check order = Seq order; `defaultRate`
    * otherwise). Purely a function of (id, source) — stable across
    * partitionings, executors, and re-runs, and reproducible in plain SQL —
    * which is what makes sampled corpora auditable. No shuffle: the filter
    * fuses into the scan. */
  def deterministicSample(docs: DataFrame, rates: Seq[(String, Double)],
                          defaultRate: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.Column
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((p, r), acc) =>
      when(col("source").startsWith(p), lit(r)).otherwise(acc)
    }
    val bucket = (col("id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    docs.filter(bucket < rate * lit(2147483648L))
  }

  /** One-row funnel metrics: row counts at every stage plus the near-dup
    * pair count. Two corpus passes, not five: one aggregate over the profile
    * scan folds n_profiled, n_kept (conditional sum) and n_exact (distinct
    * normalized keys among kept rows — exactly the exact-dedup survivor
    * count); the pair stage contributes nd_pairs and the dropped-id count,
    * so n_survivors = n_exact − distinct(id_b) without a third pass. */
  def funnel(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
             minTokens: Int = 10, jaccardThreshold: Double = 0.2): DataFrame = {
    val profiled = profile(docs)
    val keep = col("lang") === lang && col("quality") >= minQuality &&
      col("n_ws") >= minTokens
    val norm = array_join(TextFunctions.tokens(col("text")), " ")
    val head = profiled.agg(
      count(lit(1)).as("n_profiled"),
      // coalesce: sum over an empty relation is NULL, and an empty corpus
      // must report a zero funnel, not a null one
      coalesce(sum(when(keep, 1L).otherwise(0L)), lit(0L)).as("n_kept"),
      countDistinct(when(keep, norm)).as("n_exact"))
    val exact = Dedup.dedupExact(
      profiled.filter(keep).withColumn("_norm", norm), keyCol = "_norm").drop("_norm")
    val tail = MinHashLsh.nearDuplicates(exact, jaccardThreshold).agg(
      count(lit(1)).as("nd_pairs"),
      countDistinct(col("id_b")).as("n_dropped"))
    head.crossJoin(tail).select(
      col("n_profiled"), col("n_kept"), col("n_exact"), col("nd_pairs"),
      (col("n_exact") - col("n_dropped")).as("n_survivors"))
  }
}
