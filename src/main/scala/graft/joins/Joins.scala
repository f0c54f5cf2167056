package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: backward as-of join and a
  * bucketized time-range join.
  *
  * Both are built so the physical plan stays a single hash/sort-merge
  * exchange — never a cartesian or broadcast-nested-loop product — which is
  * the property that keeps them viable at 100 TB:
  *
  *  - [[asOfBackward]] is the union-tag + running-window formulation: tag
  *    both inputs, union, ONE shuffle on the join key, and a per-key
  *    time-ordered window carries the most recent right-side row forward
  *    into each left row. Cost is one exchange + one in-partition sort —
  *    identical shape to a sort-merge join — regardless of how many right
  *    rows precede each left row (the naive `join + max()` pairs every left
  *    row with its full right history before collapsing).
  *  - [[rangeJoinByTime]] buckets time by the tolerance and turns the
  *    inequality predicate into an equi-join on the bucket id (each left
  *    row probes buckets {b-1, b, b+1}; any |Δt| ≤ tol pair differs by at
  *    most one bucket), then applies the exact predicate as a post-filter.
  *    Catalyst plans the bucket condition as a shuffled hash / sort-merge
  *    join; without the bucket key it falls back to a
  *    BroadcastNestedLoopJoin over the raw inequality (PlanAuditSpec pins
  *    the difference). A dense burst puts many rows in one bucket — at
  *    cluster scale AQE's skew-join split handles that, same as any hot
  *    equi-join key.
  */
object Joins {

  /** Backward (at-or-before) as-of join.
    *
    * For every `left` row, attaches the single most recent `right` row with
    * the same `keys` whose time is ≤ the left row's time and within
    * `toleranceUs`; left rows with no such match are DROPPED (inner as-of —
    * nullable match columns flip pandas dtypes in the oracle compare).
    *
    * Tie rules: a right row at exactly the left time matches (≤, not <);
    * among right rows sharing one (keys, time) the largest `rightTieCol`
    * wins — stated so results are deterministic, mirrored in the DuckDB
    * `ASOF JOIN` oracle by pre-deduplicating the right side.
    *
    * @param leftTimeUs/rightTimeUs epoch-microsecond Long columns
    * @param rightCols right columns to carry (must not collide with left)
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeUs: String,
      rightTimeUs: String,
      rightCols: Seq[String],
      rightTieCol: String,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(keys.nonEmpty, "asOfBackward needs at least one key column")
    val leftCols = left.columns.toSeq
    val carried = (rightCols :+ rightTimeUs).distinct

    // aligned union: keys, event time, side tag (right sorts first at equal
    // time -> at-or-before includes equal), the left row as one struct, and
    // each carried right column (null on the other side's rows)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTimeUs).as("_us"), lit(1).as("_side"), lit(0L).as("_tie"),
        struct(leftCols.map(col): _*).as("_lrow")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTimeUs).as("_us"), lit(0).as("_side"),
        col(rightTieCol).cast("long").as("_tie"),
        lit(null).cast(lTagged.schema("_lrow").dataType).as("_lrow")) ++
        carried.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_us"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = lTagged.unionByName(rTagged)
      .select(Seq(col("_side"), col("_us"), col("_lrow")) ++
        carried.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_m_$c")): _*)

    withMatch
      .filter(col("_side") === 1 &&
        col(s"_m_$rightTimeUs").isNotNull &&
        col("_us") - col(s"_m_$rightTimeUs") <= toleranceUs)
      .select(leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        rightCols.map(c => col(s"_m_$c").as(c)): _*)
  }

  /** Pairs every left row with every right row whose time is within
    * `toleranceUs` (|left − right| ≤ tol, inclusive), optionally also
    * matching on `extraKeys`. Emits all columns of both inputs (caller
    * disambiguates names up front). Each qualifying pair appears exactly
    * once: the right row lives in one bucket and exactly one of the left
    * row's three probes hits it. */
  def rangeJoinByTime(
      left: DataFrame,
      right: DataFrame,
      leftTimeUs: String,
      rightTimeUs: String,
      toleranceUs: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(toleranceUs > 0, "toleranceUs must be positive")
    // integral `div`, not `/`: epoch-scale longs exceed double's mantissa
    // in nanosecond units, and `/` on longs goes through double
    val probes = left.withColumn("_bkt",
      explode(array((-1 to 1).map(d =>
        expr(s"`$leftTimeUs` div ${toleranceUs}L") + d): _*)))
    val build = right.withColumn("_bkt",
      expr(s"`$rightTimeUs` div ${toleranceUs}L"))
    val cond = probes("_bkt") === build("_bkt") &&
      abs(probes(leftTimeUs) - build(rightTimeUs)) <= toleranceUs &&
      extraKeys.map(k => probes(k) === build(k))
        .foldLeft(lit(true))(_ && _)
    val joined = probes.join(build, cond).drop("_bkt")
    // extraKeys exist on both sides; keep the left copy
    extraKeys.foldLeft(joined)((df, k) => df.drop(build(k)))
  }

  /** Skew-safe equi-join by key salting — the classic hot-key treatment
    * for BIG ⋈ BIG joins whose key distribution is dominated by a few
    * values (a 5-language corpus, a hub domain, a null-ish default key),
    * where a plain hash join funnels each hot key's rows through ONE
    * reducer. Each probe row gets a deterministic salt in [0, salts) from
    * `saltOn` (pass a stable per-row expression — e.g. xxhash64 of the
    * row's id — so the result is partition-invariant, never rand()); the
    * build side is replicated `salts`× with every salt value; the join
    * runs on (keys..., salt), spreading each hot key over `salts`
    * reducers. Every qualifying pair matches EXACTLY once (a probe row
    * carries one salt; the build copy with that salt exists uniquely), so
    * the result is row-identical to `probe.join(build, keys)`.
    *
    * Routing note: when the build side is broadcast-small, broadcast and
    * skip salting entirely — salting pays `salts`× build replication to
    * buy probe-side spread, which only wins when BOTH sides must shuffle.
    * AQE's skew-split covers sort-merge skew at runtime; explicit salting
    * remains the tool when the skew survives AQE (hot keys inside one
    * huge post-filter stage, or deliberate partitioning reuse). */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int, saltOn: Column): DataFrame = {
    require(salts > 0, "saltedJoin needs salts > 0")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(!probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename it on the input first")
    val p = probe.withColumn("_salt", pmod(saltOn, lit(salts.toLong)).cast("int"))
    val b = build.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    p.join(b, keys :+ "_salt").drop("_salt")
  }
}
