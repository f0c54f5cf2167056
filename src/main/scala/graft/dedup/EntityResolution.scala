package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: candidate generation by blocking + edit
  * distance, at DISTINCT-entity granularity.
  *
  * Scale shape, in order of importance at 100 TB:
  *  1. **Dedupe-then-match** — fuzzy comparison runs over `groupBy(name)`
  *     output, so its cost scales with the number of distinct entities,
  *     not records. A 100 TB record stream with 10M distinct names does
  *     one exact shuffle, then all edit-distance work happens on 10M rows.
  *  2. **Blocking** — candidate pairs come from an equi-join on a blocking
  *     key (the last name token here), never an all-pairs product. Recall
  *     is bounded by the blocking rule, which is the standard ER trade;
  *     the oracle applies the identical rule so results are exact w.r.t.
  *     the declared semantics.
  *  3. The per-block pair space is quadratic in block size — the skew
  *     guard at scale is a block-size cap or a second blocking pass,
  *     same family as MinHashLsh's maxBucket guard.
  *
  * `levenshtein` is Spark-codegen'd and exists verbatim in DuckDB, so the
  * whole operator is oracle-expressible.
  */
object EntityResolution {

  /** For every distinct lowercased `nameCol` value, the closest OTHER name
    * in the same block (last whitespace token) within `maxDist` edits:
    * (name, n_records, match_name, dist). Names with no candidate are
    * omitted. Ties broken by (dist, match_name) so results are
    * deterministic. */
  def bestFuzzyMatches(records: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    val names = records
      .select(lower(col(nameCol)).as("name"))
      .groupBy("name")
      .agg(count(lit(1)).as("n_records"))
      .withColumn("blk", regexp_extract(col("name"), "([^ ]+)$", 1))
    val a = names.select(col("name"), col("n_records"), col("blk"))
    val b = names.select(col("name").as("match_name"), col("blk"))
    val cand = a.join(b, Seq("blk"))
      .filter(col("name") =!= col("match_name"))
      .withColumn("dist", levenshtein(col("name"), col("match_name")).cast("long"))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy("name").orderBy(col("dist"), col("match_name"))
    cand.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("name", "n_records", "match_name", "dist")
  }

  /** Blocking-quality audit — the two numbers every ER blocking scheme is
    * judged by (standard record-linkage evaluation, e.g. Christen '12):
    * reduction ratio (how much of the all-pairs space the blocking prunes)
    * and pair completeness (what fraction of TRUE matching pairs survive
    * into a shared block — the recall the blocking rule forfeits).
    *
    * The all-pairs ground truth is quadratic in DISTINCT entities — this
    * is the EVALUATION harness, run on a bounded sample of the entity
    * space at 100 TB (the lsh_jaccard_exact discipline: the exact
    * baseline exists to grade the scale path, not to be it); candidate
    * generation itself stays the blocked equi-join.
    *
    * One row: (n_entities, all_pairs, candidate_pairs, true_pairs,
    * matched_true_pairs, reduction_ratio, pair_completeness). */
  def blockingMetrics(records: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    val names = records
      .select(lower(col(nameCol)).as("name")).distinct()
      .withColumn("blk", regexp_extract(col("name"), "([^ ]+)$", 1))
      .localCheckpoint(true) // feeds both pair sides and the entity count
    val a = names.select(col("name").as("na"), col("blk").as("ba"))
    val b = names.select(col("name").as("nb"), col("blk").as("bb"))
    val flags = a.crossJoin(b).filter(col("na") < col("nb"))
      .select((col("ba") === col("bb")).cast("long").as("sameblk"),
        (levenshtein(col("na"), col("nb")) <= maxDist).cast("long").as("istrue"))
      .agg(count(lit(1)).as("all_pairs"),
        sum("sameblk").as("candidate_pairs"),
        sum("istrue").as("true_pairs"),
        sum(col("sameblk") * col("istrue")).as("matched_true_pairs"))
    names.agg(count(lit(1)).as("n_entities")).crossJoin(flags)
      .select(col("n_entities"), col("all_pairs"), col("candidate_pairs"),
        col("true_pairs"), col("matched_true_pairs"),
        round(lit(1.0) - col("candidate_pairs").cast("double") / col("all_pairs"), 6)
          .as("reduction_ratio"),
        when(col("true_pairs") > 0,
          round(col("matched_true_pairs").cast("double") / col("true_pairs"), 6))
          .as("pair_completeness"))
  }
}
