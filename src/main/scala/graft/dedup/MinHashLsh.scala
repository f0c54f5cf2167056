package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** MinHash + LSH banding near-duplicate detection over word n-gram shingles —
  * the standard large-scale text-dedup pipeline (Broder '97 / MMDS ch.3),
  * which the reference approximates with dense embedding similarity
  * (memory_engine.py:2199). Fully deterministic and SQL-reproducible: shingle
  * hashing is [[TextFunctions.polyHash]] and the permutation family is
  * h_i(x) = ((2i+1)·x + 7919·i + 13) mod P.
  *
  * Scale shape: signatures are one narrow row per doc; banding is an
  * explode(numBands) + shuffle on (band, key) — candidate pairs only ever
  * form inside a bucket, so the quadratic blow-up of the naive self-join
  * never materializes. Skewed buckets (boilerplate shingles) are bounded by
  * `maxBucket`.
  */
object MinHashLsh {

  val P: Long = TextFunctions.HashMod
  val NumHashes = 32
  val NumBands = 8 // 4 rows per band

  /** Distinct shingle hashes per row: (id, sh: array<long>). */
  def shingleSets(df: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame =
    df.select(col("id"),
      array_distinct(TextFunctions.shingleHashes(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash signature column from a shingle-hash array column. Native
    * codegen kernel; pinned to the HOF formulation
    * transform(sequence(0,k-1), i -> array_min(transform(sh, x ->
    * (x*(2i+1) + 7919i + 13) % P))) by KernelEquivalenceSpec.
    * `sh` must be NON-EMPTY (as produced by [[shingleSets]], which filters
    * empty sets): on an empty array the kernel yields Long.MaxValue per
    * hash while the HOF form yields nulls. */
  def signature(sh: Column, numHashes: Int = NumHashes): Column =
    TextFunctions.minHashSig(sh, numHashes)

  /** One-permutation MinHash signatures (Li, Owen & Zhang '12; rotation
    * densification after Shrivastava & Li '14, simplified without the
    * offset term — all public): ONE hash evaluation per shingle instead of
    * `numHashes`. Shingle hashes are binned by x mod k, each bin keeps its
    * min, and an empty bin borrows the value of the next non-empty bin
    * rightward (wrapping) — so the signature build does k× less hashing
    * work per shingle than the k-permutation family, the reason OPH is
    * the production MinHash at corpus scale.
    *
    * Both stages are codegen HOF column math over the shingle array (the
    * bin mins are a named intermediate so whole-stage subexpression
    * elimination computes them once per row); `sh` must be non-empty (as
    * [[shingleSets]] guarantees), so at least one bin is non-null and the
    * rotation always terminates. Deterministic and SQL-reproducible.
    *
    * NOTE the rotation coalesce is QUADRATIC in `numHashes`: each of the k
    * signature slots enumerates up to k fallback bins, so the projected
    * expression tree holds k² element_at nodes (1,024 at the default
    * k = 32). Raising k risks codegen blowup (64KB JVM method limit →
    * whole-stage fallback), so the k ≤ 64 bound below is enforced, not
    * advisory; beyond that, densify via an extra per-row HOF pass instead. */
  def ophSignatures(sh: DataFrame, numHashes: Int = NumHashes): DataFrame = {
    val k = numHashes
    require(k <= 64,
      s"ophSignatures: numHashes=$k would emit ~${k * k} coalesce arms " +
        "(quadratic rotation-densification) and break whole-stage codegen; " +
        "use <= 64 or add a second densification pass")
    sh.withColumn("_m", transform(sequence(lit(0), lit(k - 1)),
        i => array_min(filter(col("sh"), x => pmod(x, lit(k.toLong)) === i.cast("long")))))
      .withColumn("sig", transform(sequence(lit(0), lit(k - 1)), i =>
        coalesce((0 until k).map(off =>
          element_at(col("_m"), (pmod(i + lit(off), lit(k)) + lit(1)).cast("int"))): _*)))
      .select(col("id"), col("sig"))
  }

  /** (id, band, key) — one row per band; key is the joined band slice. */
  def bands(sigs: DataFrame, numBands: Int = NumBands,
            numHashes: Int = NumHashes): DataFrame = {
    val rows = numHashes / numBands
    sigs.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(numBands - 1)),
          b => concat_ws(",", transform(slice(col("sig"), b * lit(rows) + 1, lit(rows)),
            x => x.cast("string"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH band bucket.
    * Buckets larger than `maxBucket` are dropped (skew guard — a degenerate
    * shingle set would otherwise produce a quadratic bucket). */
  def candidatePairs(df: DataFrame, n: Int = 3, maxBucket: Int = 1000): DataFrame =
    candidatePairsFromShingles(shingleSets(df, n), maxBucket)

  /** As [[candidatePairs]] but over a precomputed (id, sh) shingle frame, so
    * pipelines that also verify with exact Jaccard hash the shingles once. */
  def candidatePairsFromShingles(sh: DataFrame, maxBucket: Int = 1000): DataFrame =
    bandedPairs(sh.select(col("id"), signature(col("sh")).as("sig")), maxBucket)

  /** Banding + skew-guarded bucket self-join over any (id, sig) frame —
    * shared by the k-permutation and OPH signature families.
    *
    * The skew guard is a COUNT WINDOW over (band, key) instead of the
    * former groupBy + join back: the admitted set is identical (cnt is the
    * same exact bucket size), but the window shares its (band, key) hash
    * partitioning with the self-join that follows, so the guard costs no
    * extra shuffle of the banded frame (guide §2.4: operations keyed the
    * same way share one exchange; before, the banded frame was shuffled
    * once for the size aggregate and again for the join back).
    *
    * Buffering trade (r17 verdict #4): the window buffers each (band, key)
    * bucket in ONE task before the cnt filter drops it — the old groupBy
    * shrank hot buckets via map-side partial aggregation, so a degenerate
    * bucket now spills in the window instead of being counted cheaply. Not
    * a new asymptotic risk: the self-join that follows keys the same way,
    * so the same bucket had the identical single-task exposure before;
    * SkewGuardSpec pins that a pathological bucket is still dropped whole. */
  private def bandedPairs(sigs: DataFrame, maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = bands(sigs)
    val ok = banded
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("band", "key")))
      .filter(col("cnt") <= maxBucket)
      .select("id", "band", "key")
    ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** [[nearDuplicates]] with the OPH signature family: identical banding,
    * verification, and output contract — only the signature build changes
    * (one hash pass instead of k). */
  def nearDuplicatesOph(df: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingleSets(df, n).localCheckpoint(true)
    bandedPairs(ophSignatures(sh), maxBucket = 1000)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jaccard", round(TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Full near-dup pipeline: LSH candidates verified by exact n-gram Jaccard
    * ≥ `threshold`. Output (id_a, id_b, jaccard rounded 6). */
  def nearDuplicates(df: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    // eager checkpoint, not persist: shingles are read three times (banding
    // + both verify sides); checkpoint blocks are GC-freed with the frame
    // rather than pinned in the CacheManager until a manual unpersist
    val sh = shingleSets(df, n).localCheckpoint(true)
    candidatePairsFromShingles(sh)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jaccard", round(TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Incremental near-dup pairs: only pairs with at least one id on the
    * `newSh` side, verified by exact Jaccard ≥ threshold — the refresh step
    * of an incremental dedup (the old-old pairs were resolved when the old
    * batch landed; re-deriving them on every ingest is the O(corpus) cost
    * this avoids). Two contracts keep it EXACTLY equal to a full-batch
    * [[nearDuplicates]] run (pinned by CurationSpec):
    *  - bucket skew sizing runs over the FULL (old ∪ new) band set, so the
    *    `maxBucket` guard admits/rejects identical buckets;
    *  - new ids must be strictly greater than every old id, so the dropped
    *    (greater) side of each generated pair is always new and old-batch
    *    decisions never flip.
    * `oldSh` is the retained (id, sh) shingle state — at scale a stored
    * table, refreshed by appending `newSh`. */
  def nearDuplicatesIncremental(oldSh: DataFrame, newSh: DataFrame,
                                threshold: Double,
                                maxBucket: Int = 1000): DataFrame = {
    // newSh is read twice (the union AND the new-side semi-join) and its
    // lineage is the caller's whole profile/dedup pipeline — materialize
    // the (small) new batch so the semi-join reads blocks, not the pipeline
    val newShCk = newSh.localCheckpoint(true)
    val allSh = oldSh.unionByName(newShCk).localCheckpoint(true)
    val sigs = allSh.select(col("id"), signature(col("sh")).as("sig"))
    val banded = bands(sigs)
    // same count-window skew guard as [[bandedPairs]]: identical admitted
    // buckets (sizing still runs over the FULL merged band set), one less
    // shuffle of the banded frame
    val okAll = banded
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
      .filter(col("cnt") <= maxBucket)
      .select("id", "band", "key")
    val okNew = okAll.join(newShCk.select("id"), Seq("id"), "left_semi")
    val cand = okAll.as("a").join(okNew.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(allSh.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(allSh.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jaccard", round(TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard over ALL pairs (correctness baseline for the LSH
    * path; O(n²) — small corpora only). */
  def exactJaccardPairs(df: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingleSets(df, n)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    sh.select(col("id").as("id_a"), col("sh").as("sha")).repartition(nPart)
      .join(sh.select(col("id").as("id_b"), col("sh").as("shb")),
        col("id_a") < col("id_b"))
      .withColumn("jaccard", round(TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
