package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLsh

/** Bloom-gated benchmark decontamination.
  *
  * Same contract as [[Curation.contamination]] — (id, bench_id, n_shared)
  * for corpus docs sharing ≥ `minShared` distinct word n-gram shingles with
  * a benchmark doc — but the corpus side is prefiltered through a broadcast
  * Bloom filter built over the benchmark's shingle hashes.
  *
  * Why this matters at 100 TB: the plain formulation joins EVERY corpus
  * shingle occurrence against the (broadcast) benchmark set, so the join
  * operator still consumes the full exploded corpus stream. Here the probe
  * is a map-side O(1) bit test fused into the scan-explode stage; the join
  * only ever sees grams the filter admits (≈ true hits + fpp·|corpus
  * grams|), which for a clean corpus is orders of magnitude smaller. The
  * Bloom bit array is size-bounded by (expectedItems, fpp) regardless of
  * corpus size — eval benches are small, so a few MB broadcast replaces
  * nothing-at-scale: the corpus never shuffles in either form.
  *
  * Exactness: a Bloom filter has no false negatives, so the prefilter
  * drops no real collision; false positives are killed by the exact verify
  * join that follows. Result ≡ [[Curation.contamination]] row-for-row
  * (BloomSpec pins this; the DuckDB oracle is the exact intersection SQL).
  *
  * The probe is a Scala UDF over the broadcast sketch — no builtin
  * `might_contain` is exposed in the public Column API, and a boolean
  * bit-probe UDF on an already-exploded Long column is cheap relative to
  * the shingling kernel feeding it.
  */
object BloomDecontam {

  def bloomContamination(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minShared: Int = 1,
      fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession

    val benchGrams = MinHashLsh.shingleSets(benchmark, n)
      .select(col("id").as("bench_id"), explode(col("sh")).as("h"))
    // size the filter from the actual distinct-gram count: one tiny
    // aggregate over the (small) bench side, not a guess that under-sizes
    // the bit array and inflates fpp
    val nGrams = math.max(1L, benchGrams.select("h").distinct().count())
    val bf = benchGrams.stat.bloomFilter("h", nGrams, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))

    val candidates = MinHashLsh.shingleSets(docs, n)
      .select(col("id"), explode(col("sh")).as("h"))
      .filter(mightContain(col("h")))

    candidates.join(broadcast(benchGrams), "h")
      .groupBy("id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
