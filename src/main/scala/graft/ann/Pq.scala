package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product quantization (PQ) — the byte-per-subspace compressed ANN tier
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public). Completes the Faiss-shaped index family
  * next to IVF (partition pruning, [[Ann]]) and SQ8 (scalar compression,
  * [[Quantize]]): the vector is split into `m = dim/subDim` subspaces, each
  * sub-vector is snapped to its nearest per-subspace centroid ("code"), and
  * a query is scored against codes through a precomputed m×ks lookup table
  * (asymmetric distance computation, ADC) — never touching the raw floats.
  *
  * Determinism contract (the house oracle rules): sub-distances and
  * LUT entries are rounded to 6dp before any argmin/sum; the ADC sum runs
  * in integer micro-units so per-row accumulation is order-free; argmin
  * ties break by ascending code label. The DuckDB oracle reproduces every
  * stage bit-for-bit.
  *
  * Scale shape:
  *  - codebook training is one posexplode aggregation over the labeled
  *    fixture vectors, bounded by [[Ann.MaxNlist]] total rows (the same
  *    deterministic label-group seeding [[Ann.centroidsByLabel]] uses);
  *  - encoding is a WRITE-time job: broadcast codebooks (≤ m·ks rows)
  *    against the corpus, per-(id,sub) min aggregated map-side — one
  *    shuffle keyed by id, no window;
  *  - ADC scoring is MAP-ONLY: the m×ks table is collected (bounded),
  *    baked into a literal map, and each row's score is a fused
  *    whole-stage-codegen fold over its m codes — scan →
  *    TakeOrderedAndProject, zero shuffles, 1 byte/dim of index traffic
  *    instead of 4 — exactly why PQ is the 100 TB serving shape.
  */
object Pq {

  /** Dims per subspace. 64-dim fixture vectors → m = 8 subspaces; ks = the
    * label cardinality (≤ [[Ann.MaxNlist]]), 10 in the fixture. */
  val SubDim = 8

  /** Micro-unit scale for the order-free integer ADC accumulation. */
  val Micro = 1e6

  /** Per-subspace codebooks from the labeled fixture vectors:
    * (sub, label, codevec) where codevec = per-dim mean of the label
    * group's sub-vectors (raw means — PQ codebooks are not re-normalized).
    * Bounded output: m·ks ≤ MaxNlist rows, broadcastable by construction. */
  def codebooks(embeddings: DataFrame, subDim: Int = SubDim): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .withColumn("sub", expr(s"pos div $subDim").cast("int"))
      .groupBy("sub", "label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("codevec"))
      .orderBy("sub", "label").limit(Ann.MaxNlist)

  /** Rounded squared L2 distance between a sub-vector and a codeword —
    * the encoding metric (6dp before argmin, house determinism rule). */
  private def subDist(subVec: Column, codeVec: Column): Column =
    round(aggregate(
      zip_with(subVec, codeVec, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (a, x) => a + x), 6)

  /** Encode: adds `pq_codes` (array<int>, one code per subspace, ordered by
    * subspace index). MAP-ONLY: the bounded codebook frame (≤ m·ks rows)
    * is collected and baked into literal arrays, and each row's m argmins
    * run as a fused whole-stage-codegen fold — PQ encoding is
    * embarrassingly parallel, so the write path carries ZERO shuffles and
    * no join (ScaleOpsSpec pins bit-equality to the broadcast-join
    * formulation [[encodeJoin]]). */
  def encode(df: DataFrame, books: DataFrame, vecCol: String = "embedding",
             subDim: Int = SubDim): DataFrame = {
    // (sub → (labels, codevecs)) sorted by label for the tiebreak-by-
    // first-scan argmin below
    val bySub = books.select(col("sub"), col("label"), col("codevec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rs) => (s, rs.sortBy(_._2).map(r => (r._2, r._3))) }
    val codeFor = bySub.map { case (sub, entries) =>
      val sv = slice(col(vecCol), sub * subDim + 1, subDim)
      // array_min over (dist, label) structs = lexicographic argmin with
      // the ascending-label tiebreak — identical to min(struct(d, label)),
      // and LINEAR in ks (a when/otherwise fold would duplicate the
      // accumulator expression per step and blow up codegen)
      val scored = entries.map { case (label, cv) =>
        struct(subDist(sv, typedLit(cv)).as("d"), lit(label).as("l"))
      }
      array_min(array(scored: _*)).getField("l").cast("int")
    }
    df.withColumn("pq_codes", array(codeFor: _*))
  }

  /** The broadcast-join formulation of [[encode]] — per-(id,sub) argmin as
    * a map-side-combinable min(struct) over the exploded codebook join.
    * Kept as the semantic pin (ScaleOpsSpec asserts bit-equality); the
    * literal-fold form is the shipping path. */
  def encodeJoin(df: DataFrame, books: DataFrame, vecCol: String = "embedding",
                 subDim: Int = SubDim): DataFrame = {
    val best = df.select(col("id"), col(vecCol).as("_v"))
      .join(broadcast(books))
      .withColumn("_d", subDist(
        slice(col("_v"), col("sub") * subDim + lit(1), lit(subDim)), col("codevec")))
      .groupBy("id", "sub")
      .agg(min(struct(col("_d"), col("label"))).as("_b"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"),
        col("_b").getField("label").cast("int").as("code")))),
        x => x.getField("code")).as("pq_codes"))
    df.join(best, "id")
  }

  /** The ADC lookup table for one query: key = sub·MaxNlist + label,
    * value = round(dot(q_sub, codevec), 6) in integer micro-units. Bounded
    * at m·ks ≤ MaxNlist entries — safe to collect and bake into a literal. */
  def adcTable(books: DataFrame, queryVec: Seq[Float],
               subDim: Int = SubDim): Map[Int, Long] =
    books.select(
        (col("sub") * Ann.MaxNlist + col("label")).cast("int").as("k"),
        round(round(VectorFunctions.dot(col("codevec"),
          slice(typedLit(queryVec), col("sub") * subDim + lit(1), lit(subDim))), 6) * Micro)
          .cast("long").as("micro"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** ADC scores: (id, adc) — a map-only fold of each row's m codes through
    * the literal lookup table; integer micro-unit accumulation, one final
    * division. The fused, shuffle-free PQ serving plan. */
  def adcScores(encoded: DataFrame, books: DataFrame, queryVec: Seq[Float],
                subDim: Int = SubDim): DataFrame = {
    val lut = adcTable(books, queryVec, subDim)
    val ks = lut.keys.toSeq.sorted
    val lutLit = map_from_arrays(typedLit(ks), typedLit(ks.map(lut)))
    val m = queryVec.length / subDim
    encoded.select(col("id"),
      round(aggregate(sequence(lit(0), lit(m - 1)),
        lit(0L),
        (acc, j) => acc + element_at(lutLit,
          (j * Ann.MaxNlist + element_at(col("pq_codes"), j + 1)).cast("int")))
        .cast("double") / Micro, 6).as("adc"))
  }

  /** PQ top-k by ADC score: (id, adc). */
  def pqTopK(encoded: DataFrame, books: DataFrame, queryVec: Seq[Float],
             k: Int): DataFrame =
    adcScores(encoded, books, queryVec)
      .orderBy(desc("adc"), asc("id"))
      .limit(k)

  /** IVF × PQ (Faiss IVFPQ shape): IVF prunes to nprobe/nlist of the rows,
    * ADC ranks the pruned pool from codes alone, and only `candidates`
    * full vectors are read for the exact re-rank: (id, ivf_cell, sim). */
  def ivfPqTopK(assigned: DataFrame, centroids: DataFrame, books: DataFrame,
                queryVec: Seq[Float], k: Int, nprobe: Int = 2,
                candidates: Int = 50): DataFrame = {
    val pool = assigned.join(broadcast(Ann.probeCells(centroids, queryVec, nprobe)), "ivf_cell")
    val cand = pqTopK(encode(pool, books), books, queryVec, candidates)
    pool.join(cand.select("id"), Seq("id"), "left_semi")
      .select(col("id"), col("ivf_cell"),
        VectorFunctions.roundScore(
          VectorFunctions.dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
