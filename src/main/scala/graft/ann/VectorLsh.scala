package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Sign-random-projection (hyperplane) LSH over dense embedding columns —
  * the candidate generator that replaces the exact all-pairs/broadcast scan
  * above driver-broadcast scale (Charikar '02 SimHash for cosine).
  *
  * Planes are DETERMINISTIC: component c(j,d) is a fixed LCG-style integer
  * formula mapped to [-1, 1], so the same buckets are computable in plain
  * SQL (the DuckDB oracle) and on any engine — no RNG state to ship.
  * 16 planes in 2 bands of 8 bits: two rows collide when all 8 sign bits of
  * either band agree, so the candidate join is a pair of equi-joins on
  * (band, key) — bucketed, never quadratic. Skewed buckets (dense clusters)
  * are bounded by `maxBucket` like [[graft.dedup.MinHashLsh]].
  */
object VectorLsh {

  val NumPlanes = 16
  val NumBands = 2
  val BitsPerBand: Int = NumPlanes / NumBands

  /** Deterministic pseudo-random plane component in [-1, 1]:
    * ((1103515245·(j·dim+d) + 12345) mod 2001 − 1000) / 1000. */
  def planeComponent(j: Int, d: Int, dim: Int): Double =
    (((1103515245L * (j.toLong * dim + d) + 12345L) % 2001L) - 1000L) / 1000.0

  /** One band-key row per (row, band): input columns + (band, key). */
  def withBandKeys(df: DataFrame, dim: Int): DataFrame = {
    val bits: Seq[Column] = (0 until NumPlanes).map { j =>
      val plane = typedLit((0 until dim).map(d => planeComponent(j, d, dim)))
      when(VectorFunctions.dot(col("embedding"), plane) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val keys = (0 until NumBands).map { b =>
      (0 until BitsPerBand).map(i => bits(b * BitsPerBand + i) * lit(1L << i))
        .reduce(_ + _)
    }
    df.select(col("*"), posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
  }

  /** Candidate pairs (id_a < id_b) sharing an LSH band bucket; buckets above
    * `maxBucket` rows are dropped (skew guard). The count window buffers
    * each bucket in one task before the filter drops it (the former groupBy
    * partially aggregated map-side) — same single-task exposure the keyed
    * self-join below always had; SkewGuardSpec pins the drop behavior. */
  def candidatePairs(df: DataFrame, dim: Int, maxBucket: Int = 10000): DataFrame = {
    val keyed = withBandKeys(df.select("id", "embedding"), dim)
    // count-window skew guard (same admitted buckets as the former
    // groupBy + join back, one less shuffle — the window shares the
    // (band, key) partitioning with the self-join below)
    val ok = keyed
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
      .filter(col("cnt") <= maxBucket)
      .select("id", "embedding", "band", "key")
    ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.embedding").as("ea"),
        col("b.id").as("id_b"), col("b.embedding").as("eb"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Per-query candidates against a separate corpus: (ia, ib, sim round 6),
    * each pair once. Feeds the bounded top-k aggregate in the size-switched
    * exact-dedup kernel ([[graft.dedup.Dedup.topNeighbors]]). */
  def candidates(queries: DataFrame, corpus: DataFrame, dim: Int,
                 maxBucket: Int = 10000): DataFrame = {
    // self-join case (dedup over one table): one eagerly-checkpointed keyed
    // frame feeds the query side, the corpus side AND the bucket-size
    // aggregate — the 16-hyperplane dot products run once, not three times.
    // Plan identity, not reference identity: two .select()s over the same
    // table must still share the frame
    val selfJoin = queries.sameSemantics(corpus)
    val ck0 = withBandKeys(corpus.select("id", "embedding"), dim)
    val ck = if (selfJoin) ck0.localCheckpoint(true) else ck0
    val qk = (if (selfJoin) ck else withBandKeys(queries.select("id", "embedding"), dim))
      .select(col("id").as("ia"), col("embedding").as("ea"), col("band"), col("key"))
    // count-window skew guard: identical admitted buckets, one less
    // shuffle of the keyed corpus frame
    val ok = ck
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
      .filter(col("cnt") <= maxBucket)
      .select(col("id").as("ib"), col("embedding").as("eb"), col("band"), col("key"))
    qk.join(ok, Seq("band", "key"))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        VectorFunctions.roundScore(VectorFunctions.dot(col("ea"), col("eb"))).as("sim"))
      .dropDuplicates("ia", "ib")
  }
}
