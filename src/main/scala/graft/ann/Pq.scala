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

  /** Driver-side collect of a (bounded, ≤ MaxNlist-row) codebook frame. */
  private[graft] def collectBooks(books: DataFrame): Seq[(Int, Int, Seq[Double])] =
    books.select(col("sub"), col("label"), col("codevec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq

  /** Driver-side collect of a (bounded, ≤ MaxNlist-row) centroid frame. */
  private[graft] def collectCentroids(centroids: DataFrame): Seq[(Int, Seq[Double])] =
    centroids.select(col("label"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq

  /** Spark's `round(col, s)` for doubles, verbatim (HALF_UP over the
    * decimal string form) — keeps the driver-side LUT math bit-identical
    * to the Column formulation and the DuckDB oracle. */
  private def roundN(d: Double, s: Int): Double =
    BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Left-to-right double fold — [[VectorFunctions.dot]]'s exact order. */
  private[graft] def dotFold(a: Seq[Double], b: Seq[Double]): Double =
    a.iterator.zip(b.iterator).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** Encode: adds `pq_codes` (array<int>, one code per subspace, ordered by
    * subspace index). MAP-ONLY: the bounded codebook frame (≤ m·ks rows)
    * is collected and baked into literal arrays, and each row's m argmins
    * run as a fused whole-stage-codegen fold — PQ encoding is
    * embarrassingly parallel, so the write path carries ZERO shuffles and
    * no join (ScaleOpsSpec pins bit-equality to the broadcast-join
    * formulation [[encodeJoin]]). */
  def encode(df: DataFrame, books: DataFrame, vecCol: String = "embedding",
             subDim: Int = SubDim): DataFrame =
    encodeRows(df, collectBooks(books), vecCol, subDim)

  /** [[encode]] over an already-collected codebook — lets one serving call
    * share a single codebook job between encoding and the ADC LUT. */
  private[graft] def encodeRows(df: DataFrame, bookRows: Seq[(Int, Int, Seq[Double])],
                                vecCol: String, subDim: Int): DataFrame = {
    // (sub → (labels, codevecs)) sorted by label for the tiebreak-by-
    // first-scan argmin below
    val bySub = bookRows
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rs) => (s, rs.sortBy(_._2).map(r => (r._2, r._3))) }
    // the codebook enters as TWO literal nested arrays indexed at runtime
    // (labsLit(i)(j) = j-th label of the i-th subspace, vecsLit the
    // codevec) and the per-subspace argmin is a HOF fold over them, so the
    // expression tree is O(1) in m·ks instead of the former fully-unrolled
    // array(struct(subDist(...literal codevec...)) per entry) — at m=8,
    // ks=16, dim=8 that tree cost ~1 s/rep of driver analysis+codegen in
    // ann_ivfpq_topk (profiled r18). Same map-only, shuffle-free plan;
    // arithmetic is identical op-for-op (zip_with/aggregate/round through
    // the same subDist, array_min over the same (d, label) structs with
    // ascending-label tiebreak), so results stay bit-equal — pinned by
    // ScaleOpsSpec's encode ≡ encodeJoin equality and the pq oracle gates.
    val subsLit = typedLit(bySub.map(_._1))
    val labsLit = typedLit(bySub.map(_._2.map(_._1)))
    val vecsLit = typedLit(bySub.map(_._2.map(_._2)))
    val m = bySub.length
    val codes = transform(sequence(lit(0), lit(m - 1)), subIdx => {
      // slice by the REAL subspace id (subsLit), not the position — the
      // former unrolled form did, and the two differ if a subspace has no
      // codebook entries at all
      val sv = slice(col(vecCol),
        element_at(subsLit, subIdx + lit(1)) * lit(subDim) + lit(1), lit(subDim))
      val entries = element_at(vecsLit, subIdx + lit(1))
      val labs = element_at(labsLit, subIdx + lit(1))
      val scored = zip_with(entries, labs,
        (cv, l) => struct(subDist(sv, cv).as("d"), l.as("l")))
      array_min(scored).getField("l").cast("int")
    })
    df.withColumn("pq_codes", codes)
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

  /** OPQ-lite energy-sorting dimension permutation (the non-parametric
    * branch of Ge, He, Ke, Sun, "Optimized Product Quantization", CVPR
    * 2013 — public: reorder dimensions before the sub-block split instead
    * of learning a dense rotation). Dims are ranked by corpus energy and
    * assigned to subspaces in SORTED ORDER — rank r lands at position r,
    * so subspace 0 holds the 8 highest-energy dims, the last subspace the
    * 8 lowest. Each codebook then quantizes one homogeneous energy band:
    * the signal-bearing dims share subspaces (their codewords stay
    * discriminative) while the near-zero bands collapse to ≈0 codewords
    * that contribute no ADC noise.
    *
    * Measured on the fixture at equal code budget (`ann_opq_recall`):
    * recall@10 0.2 → 0.4 vs contiguous blocks. The OPQ paper's other
    * baseline — DEALING ranks round-robin to balance per-subspace
    * variance — was measured WORSE here (0.0): with per-label-mean
    * codebooks, spreading the few signal dims one-per-subspace dilutes
    * every subspace's discriminative power below its 7 noise dims,
    * whereas grouping concentrates it. Sorting is the arm the data
    * supports, so it is the one that ships.
    *
    * Energy = Σ rows round(x·10³)² per dim, in integer milli-unit squares
    * — an order-free BIGINT aggregate (house oracle rule), bounded by
    * 10⁶·rows per dim so ANSI-safe below ~9e12 rows. Ties break by
    * ascending dim. The training pass is ONE posexplode aggregation over
    * the (bounded) labeled fixture vectors; output is a `dim`-entry array,
    * `perm(newPos) = oldPos`. Because a permutation is orthonormal,
    * dot(Px, Pq) = dot(x, q): exact search is unchanged and the rotation
    * is invisible outside the codebook/code space. */
  def energyPermutation(embeddings: DataFrame, dim: Int = 64,
                        subDim: Int = SubDim): Seq[Int] = {
    val milli = round(col("col").cast("double") * 1000, 0).cast("long")
    val en = embeddings
      .select(posexplode(col("embedding")))
      .select(col("pos"), milli.as("mi"))
      .groupBy("pos").agg(sum(col("mi") * col("mi")).as("e"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(en.length == dim, s"energyPermutation saw ${en.length} dims, want $dim")
    en.sortBy { case (p, e) => (-e, p) }.map(_._1).toSeq
  }

  /** Apply a [[energyPermutation]]-style permutation to a vector column:
    * out(i) = in(perm(i)). A literal array gather — map-only, fused into
    * whole-stage codegen, no shuffle. Element type is preserved. */
  def rotate(vecCol: Column, perm: Seq[Int]): Column =
    array(perm.map(p => element_at(vecCol, p + 1)): _*)

  /** Per-subspace RESIDUAL codebooks — the Faiss IVFPQ training step
    * (Jégou '11 §IV.A): codewords quantize `x − centroid[cell]`, not `x`,
    * so every byte of code budget describes within-cell variation instead
    * of re-describing the cell the IVF key already names.
    *
    * Deterministic k-means substitute: per-label residual means are
    * DEGENERATE here (avg(x − centroid[label]) over a label group is the
    * raw mean minus its own normalization — a near-zero sliver that
    * carries no within-cell variation), so codewords are seeded by SIGN
    * OCTANT instead: each residual sub-vector lands in one of 16 buckets
    * keyed by the sign bits of its first 4 dims (6dp-rounded, the house
    * tie rule), and codevec(sub, bucket) = the bucket's per-dim mean.
    * One pass, order-free, oracle-expressible, and the buckets genuinely
    * partition residual DIRECTIONS — the structure ADC needs to rank
    * within a probed cell. Bound: m·16 ≤ MaxNlist rows. */
  def residualCodebooks(embeddings: DataFrame, centroids: DataFrame,
                        subDim: Int = SubDim): DataFrame = {
    val res = zip_with(col("embedding"), col("centroid"),
      (x, c) => x.cast("double") - c)
    def bit(j: Int, w: Int): Column =
      when(round(element_at(col("res"), col("sub") * subDim + lit(j)), 6) > 0, w)
        .otherwise(0)
    embeddings
      .join(broadcast(centroids.withColumnRenamed("label", "_clab")),
        col("label") === col("_clab"))
      .select(res.as("res"))
      .select(col("res"), posexplode(col("res")))
      .withColumn("sub", expr(s"pos div $subDim").cast("int"))
      .withColumn("label", (bit(1, 8) + bit(2, 4) + bit(3, 2) + bit(4, 1)).cast("int"))
      .groupBy("sub", "label", "pos").agg(avg(col("col")).as("m"))
      .groupBy("sub", "label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("codevec"))
      .orderBy("sub", "label").limit(Ann.MaxNlist)
  }

  /** Residual encode: subtracts the row's OWN cell centroid (a literal
    * `ivf_cell → centroid` map — bounded at MaxNlist entries, so the
    * write path carries zero shuffles AND zero joins), then runs the same
    * map-only literal-fold argmin as [[encode]] over the residual.
    * Requires an `ivf_cell` column (an [[Ann.assign]]-ed frame). */
  def encodeResidual(df: DataFrame, books: DataFrame, centroids: DataFrame,
                     vecCol: String = "embedding", subDim: Int = SubDim): DataFrame =
    encodeResidualRows(df, collectBooks(books), collectCentroids(centroids),
      vecCol, subDim)

  private[graft] def encodeResidualRows(df: DataFrame,
      bookRows: Seq[(Int, Int, Seq[Double])], centRows: Seq[(Int, Seq[Double])],
      vecCol: String, subDim: Int): DataFrame = {
    val centLit = map_from_arrays(
      typedLit(centRows.map(_._1)), typedLit(centRows.map(_._2)))
    encodeRows(
      df.withColumn("_res", zip_with(col(vecCol),
        element_at(centLit, col("ivf_cell").cast("int")),
        (x, c) => x.cast("double") - c)),
      bookRows, "_res", subDim)
      .drop("_res")
  }

  /** Per-cell `q·centroid` terms in integer micro-units — the constant the
    * residual decomposition adds back at ADC time:
    * `q·x ≈ q·centroid[cell] + q·r̂`. Driver-side fold over collected
    * centroid rows (bounded ≤ MaxNlist), same arithmetic and rounding as
    * the Column formulation. */
  private[graft] def cellDotsFromRows(centRows: Seq[(Int, Seq[Double])],
                                      queryVec: Seq[Float]): Map[Int, Long] = {
    val qd = queryVec.map(_.toDouble)
    centRows.map { case (cell, cv) =>
      cell -> roundN(roundN(dotFold(cv, qd), 6) * Micro, 0).toLong
    }.toMap
  }

  /** [[adcTable]] computed driver-side from collected codebook rows —
    * bit-identical by construction (same left-to-right fold, same
    * HALF_UP rounding); ScaleOpsSpec pins the equality. */
  private[graft] def lutFromRows(bookRows: Seq[(Int, Int, Seq[Double])],
                                 queryVec: Seq[Float], subDim: Int): Map[Int, Long] =
    bookRows.map { case (sub, label, cv) =>
      val q = queryVec.slice(sub * subDim, sub * subDim + subDim).map(_.toDouble)
      (sub * Ann.MaxNlist + label) -> roundN(roundN(dotFold(cv, q), 6) * Micro, 0).toLong
    }.toMap

  /** Residual ADC scores: (id, adc) where
    * adc = (cellMicro[ivf_cell] + Σ_sub LUT[sub, code]) / 1e6 — the same
    * map-only literal fold as [[adcScores]] plus one per-row lookup into
    * the ≤-MaxNlist cell-dot map. Still shuffle-free; still order-free
    * integer accumulation. Requires (id, ivf_cell, pq_codes). */
  def adcScoresResidual(encoded: DataFrame, books: DataFrame, centroids: DataFrame,
                        queryVec: Seq[Float], subDim: Int = SubDim): DataFrame =
    adcScoresResidualRows(encoded, collectBooks(books), collectCentroids(centroids),
      queryVec, subDim)

  private[graft] def adcScoresResidualRows(encoded: DataFrame,
      bookRows: Seq[(Int, Int, Seq[Double])], centRows: Seq[(Int, Seq[Double])],
      queryVec: Seq[Float], subDim: Int): DataFrame = {
    val lut = lutFromRows(bookRows, queryVec, subDim)
    val ks = lut.keys.toSeq.sorted
    val lutLit = map_from_arrays(typedLit(ks), typedLit(ks.map(lut)))
    val cd = cellDotsFromRows(centRows, queryVec)
    val cks = cd.keys.toSeq.sorted
    val cdLit = map_from_arrays(typedLit(cks), typedLit(cks.map(cd)))
    val m = queryVec.length / subDim
    encoded.select(col("id"),
      round((aggregate(sequence(lit(0), lit(m - 1)),
        lit(0L),
        (acc, j) => acc + element_at(lutLit,
          (j * Ann.MaxNlist + element_at(col("pq_codes"), j + 1)).cast("int")))
        + element_at(cdLit, col("ivf_cell").cast("int")))
        .cast("double") / Micro, 6).as("adc"))
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
    * RESIDUAL ADC ranks the pruned pool from codes alone (`books` must be
    * [[residualCodebooks]]; the per-cell `q·centroid` constant is added
    * back in the fold), and only `candidates` full vectors are read for
    * the exact re-rank: (id, ivf_cell, sim).
    *
    * Serving shape: codebooks and centroids are collected ONCE (both
    * bounded ≤ MaxNlist) and everything query-local — probe-cell
    * ranking, the ADC LUT, the cell-dot constants — is computed on the
    * driver, Faiss-style. The probe itself is an `ivf_cell IN (...)`
    * predicate, so a cell-partitioned store prunes at planning time. */
  def ivfPqTopK(assigned: DataFrame, centroids: DataFrame, books: DataFrame,
                queryVec: Seq[Float], k: Int, nprobe: Int = 2,
                candidates: Int = 50): DataFrame = {
    val bookRows = collectBooks(books)
    val centRows = collectCentroids(centroids)
    val qd = queryVec.map(_.toDouble)
    // nprobe query-nearest cells: dot desc, label asc — the same order
    // [[Ann.probeCells]] computes, driver-side (identical fold, identical
    // doubles, identical ordering)
    val probed = centRows.map { case (l, cv) => (l, dotFold(cv, qd)) }
      .sortBy { case (l, s) => (-s, l) }.take(nprobe).map(_._1)
    val probedCents = centRows.filter(c => probed.contains(c._1))
    val pool = assigned.filter(col("ivf_cell").isin(probed: _*))
    val enc = encodeResidualRows(pool, bookRows, probedCents, "embedding", subDim = SubDim)
    val cand = adcScoresResidualRows(enc.select("id", "ivf_cell", "pq_codes"),
        bookRows, probedCents, queryVec, subDim = SubDim)
      .orderBy(desc("adc"), asc("id")).limit(candidates)
    pool.join(cand.select("id"), Seq("id"), "left_semi")
      .select(col("id"), col("ivf_cell"),
        VectorFunctions.roundScore(
          VectorFunctions.dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
