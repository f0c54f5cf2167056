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
}
