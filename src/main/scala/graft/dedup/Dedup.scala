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

  /** Per-row top-`searchK` neighbors of `queries` against `corpus` by
    * embedding cosine: (ia, ib, sim rounded 6), (sim desc, ib asc) order.
    *
    * Kernel shape: the corpus side is collected + broadcast once and each
    * partition streams its query rows against it with a bounded top-k -- no
    * joined rows ever materialize and nothing quadratic shuffles. (The
    * declarative forms -- non-equi join + window, or + TopKScored aggregate --
    * copy one UnsafeRow per PAIR before reducing.) This is the genuinely
    * imperative per-partition kernel; rounding is BigDecimal HALF_UP,
    * identical to Spark's round() and the DuckDB oracle. Beyond
    * driver-broadcast scale the LSH/IVF candidate paths replace the exact
    * scan ([[MinHashLsh]], [[graft.ann.Ann]]).
    */
  def topNeighbors(queries: DataFrame, corpus: DataFrame, searchK: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val side = corpus.select("id", "embedding").as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(side)
    queries.select("id", "embedding").as[(Long, Array[Float])]
      .mapPartitions { it =>
        // flatten the broadcast side once per partition: primitive id/float
        // arrays beat an array of tuples for cache locality on the n*m scan
        val sideArr = bc.value
        val m = sideArr.length
        val dim = if (m > 0) sideArr(0)._2.length else 0
        val ids = new Array[Long](m)
        val flat = new Array[Float](m * dim)
        var x = 0
        while (x < m) {
          ids(x) = sideArr(x)._1
          System.arraycopy(sideArr(x)._2, 0, flat, x * dim, dim)
          x += 1
        }
        // half-away-from-zero at 6 dp — same fast double path DuckDB's
        // round() uses (cross-checked by the oracle hash compare)
        def round6(v: Double): Double =
          if (v >= 0) math.floor(v * 1e6 + 0.5) / 1e6
          else -math.floor(-v * 1e6 + 0.5) / 1e6
        it.flatMap { case (ia, ea) =>
          val topS = new Array[Double](searchK)
          val topI = new Array[Long](searchK)
          var size = 0
          var j = 0
          while (j < m) {
            val ib = ids(j)
            if (ib != ia) {
              var s = 0.0
              val base = j * dim
              var d = 0
              while (d < dim) { s += ea(d).toDouble * flat(base + d); d += 1 }
              s = round6(s)
              if (size < searchK || s > topS(size - 1) ||
                  (s == topS(size - 1) && ib < topI(size - 1))) {
                var pos = if (size < searchK) size else searchK - 1
                while (pos > 0 && (s > topS(pos - 1) ||
                    (s == topS(pos - 1) && ib < topI(pos - 1)))) {
                  topS(pos) = topS(pos - 1); topI(pos) = topI(pos - 1); pos -= 1
                }
                topS(pos) = s; topI(pos) = ib
                if (size < searchK) size += 1
              }
            }
            j += 1
          }
          (0 until size).map(i => (ia, topI(i), topS(i)))
        }
      }
      .toDF("ia", "ib", "sim")
  }

  /** Corpus row count above which the exact broadcast-scan kernel switches
    * to LSH-bucketed candidates + exact verify (2M 64-d float rows ≈ 0.5 GB
    * broadcast — the upper bound of comfortable executor broadcast). */
  val BroadcastMaxRows: Long = 2000000L

  /** Scale path of [[topNeighbors]]: sign-random-projection LSH buckets
    * generate candidates ([[graft.ann.VectorLsh]]), exact dot verifies, a
    * per-query bounded rank keeps the top `searchK`. Fully distributed —
    * two equi-joins on (band, key), nothing collects to the driver. Same
    * output shape as [[topNeighbors]]; recall is approximate (only pairs
    * sharing a band bucket are scored), which is the standard trade at
    * corpus sizes where the exact scan is impossible. */
  def topNeighborsLsh(queries: DataFrame, corpus: DataFrame, searchK: Int,
                      dim: Int = 64): DataFrame = {
    val cand = graft.ann.VectorLsh.candidates(queries, corpus, dim)
    val w = Window.partitionBy("ia").orderBy(desc("sim"), asc("ib"))
    cand.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= searchK)
      .select("ia", "ib", "sim")
  }

  /** Size-switched kernel: exact broadcast scan up to `broadcastMaxRows`
    * corpus rows, LSH candidates + exact verify beyond. `corpusRows` comes
    * from table statistics at scale (never a count() scan on the hot path).
    */
  def topNeighborsAuto(queries: DataFrame, corpus: DataFrame, searchK: Int,
                       corpusRows: Long, dim: Int = 64,
                       broadcastMaxRows: Long = BroadcastMaxRows): DataFrame =
    if (corpusRows <= broadcastMaxRows) topNeighbors(queries, corpus, searchK)
    else topNeighborsLsh(queries, corpus, searchK, dim)

  /** D2: near-duplicate pairs by embedding cosine -- per-row top-`searchK`
    * neighbors, threshold, deduped unordered pair key, sim rounded to 4
    * (memory_engine.py:2199-2237). Output: (id_a, id_b, similarity) with
    * id_a < id_b, sorted by similarity desc.
    *
    * `corpusRows` (from table stats) routes corpora beyond broadcast scale
    * through the LSH candidate path; the registered fixture queries pass
    * None (exact kernel — the oracle-matched semantics). */
  def findDuplicates(df: DataFrame, threshold: Double = 0.90, searchK: Int = 5,
                     corpusRows: Option[Long] = None): DataFrame =
    corpusRows.map(topNeighborsAuto(df, df, searchK, _)).getOrElse(topNeighbors(df, df, searchK))
      .filter(col("sim") >= threshold)
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        round(col("sim"), 4).as("similarity"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(desc("similarity"), asc("id_a"), asc("id_b"))

  /** D3: dedup execution — remove the higher id of each duplicate pair,
    * keeping the earliest entry (memory_engine.py:2239-2272). Returns
    * surviving rows of `df`. `corpusRows` (table stats) routes corpora
    * beyond broadcast scale through the LSH candidate path. */
  def deduplicate(df: DataFrame, threshold: Double = 0.90,
                  corpusRows: Option[Long] = None): DataFrame = {
    val remove = findDuplicates(df, threshold, corpusRows = corpusRows)
      .select(col("id_b").as("id")).distinct()
    df.join(remove, Seq("id"), "left_anti")
  }

  /** D8: smart-import three-band resolution (memory_engine.py:2564-2637).
    * For each incoming row, compare against its best match in `existing`:
    * sim ≥ skip band → "skip"; sim < add band → "add"; otherwise newer
    * timestamp wins → "replace" or "skip_older". */
  def smartImportActions(incoming: DataFrame, existing: DataFrame,
                         skipThreshold: Double = 0.95,
                         addThreshold: Double = 0.80,
                         corpusRows: Option[Long] = None): DataFrame = {
    val best = corpusRows.map(topNeighborsAuto(incoming, existing, 1, _))
      .getOrElse(topNeighbors(incoming, existing, searchK = 1))
    resolveBands(incoming, existing, best, skipThreshold, addThreshold)
  }

  /** [[smartImportActions]] with the best-match read answered from the
    * persisted IVF index over the EXISTING store — the ingest-path gate the
    * reference runs per import batch (memory_engine.py:2564-2637 probes its
    * ANN store per row): the whole batch's best matches come from ONE
    * partition-pruned scan of the probed cell dirs
    * ([[graft.ann.IvfIndex.probedCandidatesBatch]]) instead of an
    * in-session kernel over the full existing corpus — at 100 TB the
    * existing store's embeddings are never re-scanned by an import. Same
    * three-band resolution ([[resolveBands]] is shared), same top-1
    * tie-break (sim desc, candidate id asc); the candidate pool is the
    * probed cells — IVF's recall trade, adjudicated by
    * `d8_smart_import_indexed`'s probed-cell-restricted oracle. */
  def smartImportActionsIndexed(spark: org.apache.spark.sql.SparkSession,
                                incoming: DataFrame, existing: DataFrame,
                                ivfPath: String,
                                skipThreshold: Double = 0.95,
                                addThreshold: Double = 0.80,
                                nprobe: Int = 2): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("id"))
    val best = graft.ann.IvfIndex.probedCandidatesBatch(spark, ivfPath,
        incoming.select(col("id").as("qid"), col("embedding").as("qv")), nprobe)
      .filter(col("id") =!= col("qid")) // same self-exclusion as the kernel
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("qid").as("ia"), col("id").as("ib"), col("sim"))
    resolveBands(incoming, existing, best, skipThreshold, addThreshold)
  }

  /** The D8 three-band resolution over a computed best-match frame
    * (ia, ib, sim) — shared by the in-session kernel path and the
    * index-backed batch probe, so the band semantics cannot drift. */
  private def resolveBands(incoming: DataFrame, existing: DataFrame,
                           best: DataFrame, skipThreshold: Double,
                           addThreshold: Double): DataFrame =
    // left joins: an incoming row with no best match (empty/tiny `existing`,
    // or probed cells empty of candidates on the indexed path) resolves to
    // "add" (memory_engine.py:2564-2637), not silent drop
    incoming.select(col("id").as("ia"), col("created_at").as("in_ts"))
      .join(best, Seq("ia"), "left")
      .join(existing.select(col("id").as("ib"), col("created_at").as("ex_ts")), Seq("ib"), "left")
      .select(
        col("ia").as("id"), col("ib").as("match_id"), col("sim"),
        when(col("sim").isNull || col("sim") < addThreshold, "add")
          .when(col("sim") >= skipThreshold, "skip")
          .when(col("in_ts") > col("ex_ts"), "replace")
          .otherwise("skip_older").as("action"))

}
