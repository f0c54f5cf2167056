package graft

import org.apache.spark.sql.functions._
import graft.functions.SparkHash

/** Pins [[graft.functions.SparkHash]]'s driver-side Murmur3 to Spark's
  * `hash()` column bit-for-bit — the equality every planning-time bucket
  * list (BM25Index pb/db pruning) rests on. If a Spark upgrade ever moved
  * the hash function or seed, this is the spec that catches it before a
  * pruned maintenance read silently misses its partitions. */
class HashBridgeSpec extends SparkSpec {

  test("driver-side hashLong equals hash() over longs, incl. negatives and extremes") {
    val s = spark
    import s.implicits._
    val vs: Seq[Long] = Seq(0L, 1L, -1L, 42L, -42L, 7919L, Long.MaxValue,
      Long.MinValue, 1234567890123L, -987654321987L) ++
      (0 until 100).map(i => i * 2654435761L - 50L * 2654435761L)
    val sparkSide = vs.toDF("v")
      .select(col("v"), hash(col("v")).as("h"))
      .as[(Long, Int)].collect().toMap
    vs.foreach { v =>
      assert(SparkHash.hashLong(v) == sparkSide(v),
        s"hashLong($v): driver ${SparkHash.hashLong(v)} vs spark ${sparkSide(v)}")
    }
  }

  test("driver-side hashString equals hash() over strings, incl. unicode and empty-ish") {
    val s = spark
    import s.implicits._
    val vs = Seq("a", "term", "the", "spark window agg", "naïve café 日本語",
      "x" * 300, "7919", " ", "\t", "a,b,c|d") ++
      (0 until 50).map(i => s"tok_${i}_${"ab" * (i % 7)}")
    val sparkSide = vs.toDF("v")
      .select(col("v"), hash(col("v")).as("h"))
      .as[(String, Int)].collect().toMap
    vs.foreach { v =>
      assert(SparkHash.hashString(v) == sparkSide(v),
        s"hashString($v): driver ${SparkHash.hashString(v)} vs spark ${sparkSide(v)}")
    }
  }

  test("spread is a bijection on the 31-bit residue domain (and matches its SQL form)") {
    // the sample-cap cut's determinism rests on this: an LCG with an odd
    // multiplier is a bijection mod 2^31, so ids within one residue class
    // width never collide on the spread key and the cut boundary is a
    // strict order (the id tiebreaker only arbitrates ids exactly 2^31
    // apart). Verified by pigeonhole on a driver-side sample plus the
    // column/driver parity the oracles replay.
    val s = spark
    import s.implicits._
    def lcg(i: Long) = ((i % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    // driver-side: distinct residues -> distinct spread keys
    val ids = (0L until 4096L) ++ Seq(2147483647L, 1L << 30, 7919L) ++
      (0 until 512).map(i => (i * 4194301L) % 2147483648L)
    val distinctIds = ids.distinct
    assert(distinctIds.map(lcg).distinct.size == distinctIds.size,
      "LCG spread keys must not collide within one residue class")
    // column-side equals the driver-side formula (and thus the SQL replay)
    val sample = distinctIds.take(600)
    val colSide = sample.toDF("id")
      .select(col("id"), SparkHash.spread(col("id")).as("k"))
      .as[(Long, Long)].collect().toMap
    sample.foreach(i => assert(colSide(i) == lcg(i), s"spread($i)"))
  }

  test("spreadSql replays spread() for NEGATIVE ids too (pmod wrap, r16 ADVICE)") {
    // ANSI `%` keeps the dividend's sign (Spark and DuckDB agree), so the
    // SQL replay must wrap the inner residue into a positive modulus or a
    // negative id diverges from the column side's pmod. Evaluating the
    // generated SQL text through Spark's own parser exercises exactly the
    // semantics DuckDB gives the oracle.
    val s = spark
    import s.implicits._
    val ids = Seq(-1L, -42L, -2147483648L, -2147483649L, Long.MinValue,
      Long.MaxValue, 0L, 7919L, -7919L)
    val both = ids.toDF("id")
      .select(col("id"), SparkHash.spread(col("id")).as("k"),
        expr(SparkHash.spreadSql("id")).as("ksql"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (i, k, ksql) =>
      assert(k == ksql, s"spreadSql($i) = $ksql but spread = $k")
      assert(k >= 0L, s"spread($i) must be non-negative, got $k")
    }
  }

  test("bucketOf* equals pmod(hash(col), n) for the index layouts' bucket counts") {
    val s = spark
    import s.implicits._
    val longs = (-20L to 20L) ++ Seq(Long.MinValue, Long.MaxValue)
    val lb = longs.toDF("v")
      .select(col("v"), pmod(hash(col("v")), lit(32)).as("b"))
      .as[(Long, Int)].collect().toMap
    longs.foreach(v => assert(SparkHash.bucketOfLong(v, 32) == lb(v)))
    val strs = Seq("alpha", "beta", "gamma", "Δ", "")
    val sb = strs.toDF("v")
      .select(col("v"), pmod(hash(col("v")), lit(32)).as("b"))
      .as[(String, Int)].collect().toMap
    strs.foreach(v => assert(SparkHash.bucketOfString(v, 32) == sb(v)))
  }
}
