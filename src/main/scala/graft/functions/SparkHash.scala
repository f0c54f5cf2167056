package graft.functions

import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side twins of Spark's `hash()` column (Murmur3, seed 42) — the
  * planning-time bucket math for the hash-partitioned index layouts
  * ([[graft.search.BM25Index]]'s `pb`/`db` dirs). A maintenance call or a
  * query knows its keys on the driver (query terms, a collected batch-id
  * list); deriving the bucket list with these instead of a
  * `df.select(pmod(hash(...)))` round-trip removes one Spark job per call —
  * the r11 verdict's JobCountSpec trim.
  *
  * Equality with the executor-side `hash()` values is PINNED (not assumed)
  * by HashBridgeSpec: longs go through `Murmur3_x86_32.hashLong(v, 42)`
  * exactly as Catalyst's `Murmur3Hash` evaluates a LongType child, and
  * strings through `UTF8String.hashCode()` (Murmur3 over the UTF-8 bytes,
  * seed 42 — the same call `Murmur3Hash` makes for a StringType child). */
object SparkHash {

  val Seed = 42

  def hashLong(v: Long): Int = Murmur3_x86_32.hashLong(v, Seed)

  def hashString(s: String): Int = UTF8String.fromString(s).hashCode()

  /** `pmod(h, n)` with Spark's positive-modulus semantics. */
  def pmod(h: Int, n: Int): Int = { val m = h % n; if (m < 0) m + n else m }

  def bucketOfLong(v: Long, n: Int): Int = pmod(hashLong(v), n)

  def bucketOfString(s: String, n: Int): Int = pmod(hashString(s), n)
}
