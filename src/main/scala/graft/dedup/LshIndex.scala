package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SparkHash
import graft.sources.{IndexManifest, Store}

/** Persisted MinHash-LSH index — the shingle-side executor the r10/r11
  * verdicts asked for: [[graft.ops.Invalidation.plan]] enumerates `shingle`
  * keys for a changed batch, but until now the band buckets and shingle
  * sets recomputed in-session ([[MinHashLsh]]), so the planned keys named
  * an artifact nothing persisted. This is that artifact as tables, the
  * third index family next to [[graft.search.BM25Index]] (terms) and
  * [[graft.ann.IvfIndex]] (cells):
  *
  *   <path>/shingles  (id, sh: array<long>, db)  per-doc DISTINCT 3-gram
  *                    shingle hashes, hive-partitioned by db = hash(id)
  *                    mod [[DBuckets]] — the exact-Jaccard verify side,
  *                    and the pruned presence read maintenance uses
  *                    (same trick as BM25Index's doclens)
  *   <path>/bands     (id, band, key)  one row per LSH band,
  *                    hive-partitioned by band — the candidate-generation
  *                    side; a bucket self-join shuffles on (band, key)
  *   <path>/INDEX     one [[IndexManifest]] pointer over both
  *
  * Maintenance is O(batch): an added doc contributes one shingles row and
  * [[MinHashLsh.NumBands]] band rows, appended as one generation per table;
  * a delete tombstones by id; an upsert does both in one generation. The
  * stored tables are never rescanned by maintenance (the presence check
  * reads only the batch ids' `db` partitions). Candidate generation
  * ([[nearDuplicates]]) runs over the LIVE banded view, so incremental
  * maintenance followed by a query is EXACTLY a full recompute over the
  * surviving corpus — `lsh_index_refresh`'s oracle recomputes the whole
  * MinHash pipeline in SQL from the post-maintenance corpus and
  * hash-matches.
  *
  * Docs whose text yields no 3-gram shingle (under 3 tokens) never enter
  * either table ([[MinHashLsh.shingleSets]] filters them); deleting such an
  * id is a no-op by design — unlike BM25's N, no global scalar can go
  * stale here, so deletes are lenient where [[graft.search.BM25Index]]
  * fail-louds.
  */
object LshIndex {

  /** Id-hash bucket count of the shingles layout (the maintenance-read
    * partition knob, as [[graft.search.BM25Index.DBuckets]]). */
  val DBuckets = 32

  private val Tables = Seq("shingles", "bands")

  // both writers repartition by their hive column so a write lands one
  // file per partition dir, not numPartitions × dirs of tiny files
  private def withDb(df: DataFrame): DataFrame =
    df.withColumn("db", pmod(hash(col("id")), lit(DBuckets)))
      .repartition(col("db"))

  private def bandsOf(sh: DataFrame): DataFrame =
    MinHashLsh.bands(sh.select(col("id"),
      MinHashLsh.signature(col("sh")).as("sig")))
      .repartition(col("band"))

  private def collectIds(ids: DataFrame, failOnDup: Boolean,
                         what: String): Array[Long] =
    graft.sources.MaintenanceIds.collect(ids, failOnDup, what,
      "reduce to the last version per id first")

  private def localIds(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** Shingle + band the corpus once and publish both tables under one
    * manifest. */
  def build(docs: DataFrame, path: String, n: Int = 3): Unit = {
    val sh = MinHashLsh.shingleSets(docs, n).localCheckpoint(true)
    Store.savePartitioned(withDb(sh), s"$path/shingles", "db")
    Store.savePartitioned(bandsOf(sh), s"$path/bands", "band")
    IndexManifest.capture(path, Tables)
  }

  /** O(batch) ingestion: shingle ONLY the added docs, append their rows as
    * one generation per table. Fail-loud: added ids must be new to the
    * index (pruned `db`-bucket presence read) — a replayed add would
    * otherwise band a doc twice and emit self-pairs. */
  def refresh(spark: SparkSession, path: String, addedDocs: DataFrame,
              n: Int = 3, batchId: Option[Long] = None): Unit = {
    val sh = MinHashLsh.shingleSets(addedDocs, n).localCheckpoint(true)
    val ids = collectIds(sh.select("id"), failOnDup = true, "refresh")
    if (ids.isEmpty) { IndexManifest.capture(path, Tables, batchId); return }
    val dbs = ids.map(SparkHash.bucketOfLong(_, DBuckets)).distinct.toSeq
    val already = Store.load(spark, s"$path/shingles")
      .filter(col("db").isin(dbs: _*))
      .join(broadcast(localIds(spark, ids.toSeq)), "id").count()
    require(already == 0,
      s"refresh: $already of ${ids.length} ids are ALREADY indexed — route " +
        "re-crawls through upsertRefresh (or dedupe the replayed batch)")
    // presence table (shingles — what the guard above reads) publishes
    // FIRST, so a crash between the appends fail-louds on replay instead
    // of double-banding (the BM25/IVF crash-window ordering, pinned by
    // the FaultPoints crash-replay spec)
    Store.appendBatch(withDb(sh), s"$path/shingles", "db")
    graft.sources.FaultPoints.hit("lsh.refresh.afterPresence")
    Store.appendBatch(bandsOf(sh), s"$path/bands", "band")
    IndexManifest.capture(path, Tables, batchId)
  }

  /** O(batch) delete: tombstone the ids out of both tables — ids that
    * never banded (short docs, unknown ids) are anti-join no-ops; there is
    * no global scalar here for them to corrupt. */
  def deleteRefresh(spark: SparkSession, path: String, deletedIds: DataFrame,
                    batchId: Option[Long] = None): Unit = {
    val keys = deletedIds.select("id")
    Store.deleteBatch(spark, s"$path/shingles", keys)
    Store.deleteBatch(spark, s"$path/bands", keys)
    IndexManifest.capture(path, Tables, batchId)
  }

  /** O(batch) re-crawl: ONE generation per table tombstoning the batch ids
    * and appending their fresh shingles/bands. A changed doc that shrank
    * below the shingle threshold leaves the index (tombstone only). */
  def upsertRefresh(spark: SparkSession, path: String, changedDocs: DataFrame,
                    n: Int = 3, batchId: Option[Long] = None): Unit = {
    val allIds = collectIds(changedDocs.select("id"), failOnDup = true,
      "upsertRefresh")
    if (allIds.isEmpty) { IndexManifest.capture(path, Tables, batchId); return }
    val keys = localIds(spark, allIds.toSeq)
    val sh = MinHashLsh.shingleSets(changedDocs, n).localCheckpoint(true)
    if (sh.isEmpty) {
      Store.deleteBatch(spark, s"$path/shingles", keys)
      Store.deleteBatch(spark, s"$path/bands", keys)
    } else {
      Store.upsertBatch(withDb(sh), s"$path/shingles", keys, "db")
      Store.upsertBatch(bandsOf(sh), s"$path/bands", keys, "band")
    }
    IndexManifest.capture(path, Tables, batchId)
  }

  /** The general O(batch) maintenance pass — a mixed CDC batch applied in
    * ONE generation per table (the [[graft.search.BM25Index.applyCdc]]
    * shape, shingle side): both tables get a single [[Store.upsertBatch]]
    * whose tombstone keys are ALL batch ids (changed ∪ deleted) and whose
    * data dir carries the changed docs' fresh shingles/bands; one manifest
    * swap seals the batch. Deletes are lenient (no global scalar exists to
    * go stale); duplicate changed ids and changed∩deleted overlap raise. */
  def applyCdc(spark: SparkSession, path: String,
               changed: DataFrame, deletedIds: DataFrame,
               n: Int = 3, batchId: Option[Long] = None): Unit = {
    val chIds = Option(changed)
      .map(c => collectIds(c.select("id"), failOnDup = true, "applyCdc"))
      .getOrElse(Array.empty[Long])
    val delIds = Option(deletedIds)
      .map(c => collectIds(c.select("id"), failOnDup = false, "applyCdc deletes"))
      .getOrElse(Array.empty[Long])
    val overlap = chIds.toSet.intersect(delIds.toSet)
    require(overlap.isEmpty,
      s"applyCdc: ids ${overlap.take(3).mkString(", ")} appear in BOTH the " +
        "changed and deleted slices — reduce the batch to its last event per key")
    if (chIds.isEmpty && delIds.isEmpty) {
      IndexManifest.capture(path, Tables, batchId); return
    }
    val keys = localIds(spark, (chIds ++ delIds).toSeq)
    val sh = Option(changed).filter(_ => chIds.nonEmpty)
      .map(MinHashLsh.shingleSets(_, n).localCheckpoint(true))
    if (sh.exists(!_.isEmpty)) {
      Store.upsertBatch(withDb(sh.get), s"$path/shingles", keys, "db")
      Store.upsertBatch(bandsOf(sh.get), s"$path/bands", keys, "band")
    } else {
      Store.deleteBatch(spark, s"$path/shingles", keys)
      Store.deleteBatch(spark, s"$path/bands", keys)
    }
    IndexManifest.capture(path, Tables, batchId)
  }

  /** Targeted physical maintenance — the [[graft.search.BM25Index.compactBuckets]]
    * discipline on the shingle side, completing the third family's
    * lifecycle (every persisted index now supports build / refresh /
    * deleteRefresh / upsertRefresh / applyCdc / compact): rewrite ONLY the
    * named `db` buckets of the shingles table and `band` partitions of the
    * bands table, folding their accumulated tombstone debt without
    * touching any other partition's files. The shingle worklist comes from
    * the maintenance batches' ids ([[bucketsForIds]], driver-side Murmur3
    * — zero planning jobs); the band worklist is naturally ALL
    * [[MinHashLsh.NumBands]] partitions (a doc's band rows spread one per
    * band, so any delete touches every band dir — bounded at 8, each an
    * O(partition) rewrite). Semantically invisible (`lsh_index_compact`'s
    * oracle is the delete-survivor SQL verbatim); physically targeted
    * (LshIndexSpec pins untouched shingle buckets' files byte-identical). */
  def compactBuckets(spark: SparkSession, path: String,
                     shingleBuckets: Seq[Int] = Seq.empty,
                     bands: Seq[Int] = Seq.empty): Unit = {
    if (shingleBuckets.nonEmpty)
      Store.compactPartitions(spark, s"$path/shingles", "db",
        shingleBuckets.map(b => b: Any))
    if (bands.nonEmpty)
      Store.compactPartitions(spark, s"$path/bands", "band",
        bands.map(b => b: Any))
    IndexManifest.capture(path, Tables)
  }

  /** The shingle buckets an id batch lives in — driver-side, no job. */
  def bucketsForIds(ids: Seq[Long]): Seq[Int] =
    ids.map(SparkHash.bucketOfLong(_, DBuckets)).distinct

  /** Incremental candidate generation for a just-landed batch — the
    * stored form of [[MinHashLsh.nearDuplicatesIncremental]]: only pairs
    * whose GREATER side is in `batchIds` are generated and verified, so an
    * ingest pipeline pays O(batch-side buckets), never re-deriving the
    * old-old pairs. Same two contracts as the in-session form keep it
    * EXACTLY the full-run pairs touching the batch: bucket skew sizing
    * runs over the FULL live band set (admission identical), and batch
    * ids must be strictly greater than every stored id. */
  def nearDuplicatesForBatch(spark: SparkSession, path: String,
                             batchIds: DataFrame, threshold: Double,
                             maxBucket: Int = 1000): DataFrame = {
    val ld = IndexManifest.resolve(spark, path)
    val banded = ld("bands")
    val sized = banded.groupBy("band", "key").agg(count(lit(1)).as("cnt"))
    val ok = banded.join(sized.filter(col("cnt") <= maxBucket), Seq("band", "key"))
      .select("id", "band", "key")
    val okNew = ok.join(batchIds.select("id"), Seq("id"), "left_semi")
    val cand = ok.as("a").join(okNew.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sh = ld("shingles")
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jaccard",
        round(graft.functions.TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-duplicate pairs from the PERSISTED index: the
    * [[MinHashLsh.nearDuplicates]] pipeline with candidate generation over
    * the stored live bands (skew-guarded bucket self-join) and exact
    * Jaccard verification over the stored shingles — both resolved through
    * ONE manifest read. Output (id_a, id_b, jaccard rounded 6). */
  def nearDuplicates(spark: SparkSession, path: String, threshold: Double,
                     maxBucket: Int = 1000): DataFrame = {
    val ld = IndexManifest.resolve(spark, path)
    val banded = ld("bands")
    val sized = banded.groupBy("band", "key").agg(count(lit(1)).as("cnt"))
    val ok = banded.join(sized.filter(col("cnt") <= maxBucket), Seq("band", "key"))
      .select("id", "band", "key")
    val cand = ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sh = ld("shingles")
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("jaccard",
        round(graft.functions.TextFunctions.jaccardSim(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
