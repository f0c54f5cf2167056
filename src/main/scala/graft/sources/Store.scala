package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2/S7: table persistence, atomic swap, and snapshot retention
  * (reference memory_engine.py:2643-2697 save/load + integrity check;
  * 427-459, 654-681 timestamped backups with keep-N retention;
  * qdrant_store.py:243-294 snapshot/restore).
  *
  * The reference persists one JSON array + a vector store; here state is
  * parquet directories. Writes are write-new-then-swap (the E2 atomicity
  * rule: embed/build BEFORE any destructive replace), snapshots are dated
  * copies with retention, and integrity is a row-count invariant check.
  */
object Store {

  /** Save with write-then-swap atomicity: write to `<path>.tmp`, verify
    * readable + row count, then move into place. */
  def save(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val n = spark.read.parquet(tmp).count()
    val target = Paths.get(path)
    if (Files.exists(target)) deleteRecursive(path)
    Files.move(Paths.get(tmp), target)
    n
  }

  def load(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Save partitioned by `partitionCols` (hive-style directories) with the
    * same write-then-swap atomicity as [[save]]. At 100 TB the memories
    * table is partitioned by the top-level source folder: an F1
    * source-prefix query then prunes whole directories at planning time
    * (PartitionFilters in the scan) instead of reading and filtering —
    * pinned by PlanAuditSpec "partitioned store prunes directories". */
  def savePartitioned(df: DataFrame, path: String, partitionCols: String*): Long = {
    val spark = df.sparkSession
    val tmp = path + ".tmp"
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    val n = spark.read.parquet(tmp).count()
    val target = Paths.get(path)
    if (Files.exists(target)) deleteRecursive(path)
    Files.move(Paths.get(tmp), target)
    n
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files — the maintenance pass a long-lived
    * store needs after many incremental appends (at 100 TB, thousands of
    * tiny files per partition turn planning and scan startup into the
    * bottleneck). The rewrite is a `coalesce` over the existing read
    * partitions — a narrow dependency, no shuffle — and lands through the
    * same write-then-swap as [[save]], so readers never observe a partial
    * table. Per-partition compaction of a [[savePartitioned]] layout is
    * this call applied under each partition directory. Returns
    * (files_before, files_after, rows). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    val before = parquetFiles(path)
    val bytes = before.map(p => Files.size(Paths.get(p))).sum
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val n = save(spark.read.parquet(path).coalesce(parts), path)
    (before.size, parquetFiles(path).size, n)
  }

  /** Data files of a parquet directory (part files only, no markers).
    * Files.walk holds open directory streams: drain under try/finally. */
  private def parquetFiles(path: String): Seq[String] = {
    val s = Files.walk(Paths.get(path))
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    finally s.close()
  }

  /** Integrity check (memory_engine.py:206-218): metadata row count must
    * equal the vector count — here, rows with a non-null embedding. */
  def integrityCheck(df: DataFrame): (Long, Long, Boolean) = {
    val total = df.count()
    val withVec = df.filter(org.apache.spark.sql.functions.col("embedding").isNotNull).count()
    (total, withVec, total == withVec)
  }

  /** Timestamped snapshot under `<backupDir>/<prefix>_<stamp>`; keeps the
    * newest `keep` snapshots with the prefix, deletes the rest. The stamp is
    * an explicit argument (deterministic jobs; the caller provides a clock). */
  def snapshot(df: DataFrame, backupDir: String, prefix: String, stamp: String,
               keep: Int = 5): String = {
    val dest = s"$backupDir/${prefix}_$stamp"
    df.write.mode("overwrite").parquet(dest)
    val dir = Paths.get(backupDir)
    val old = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix + "_"))
      .toSeq.sortBy(_.getFileName.toString)(Ordering[String].reverse)
      .drop(keep)
    old.foreach(p => deleteRecursive(p.toString))
    dest
  }

  /** Snapshot diff: classify every row as added / removed / changed
    * between two corpus states keyed by `idCol`, comparing the `cols`
    * projection (unchanged rows are excluded). The audit step between two
    * [[snapshot]]s — what a rollback decision or an incremental re-embed
    * reads. One full-outer hash join on id, struct equality for the
    * change test — no windows, no driver data, any corpus size. */
  def diff(before: DataFrame, after: DataFrame, idCol: String = "id",
           cols: Seq[String] = Seq("text", "source", "archived")): DataFrame = {
    val b = before.select(col(idCol).as("id"), struct(cols.map(col): _*).as("_b"))
    val a = after.select(col(idCol).as("id"), struct(cols.map(col): _*).as("_a"))
    b.join(a, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_b").isNull, lit("added"))
          .when(col("_a").isNull, lit("removed"))
          .when(col("_b") =!= col("_a"), lit("changed")).as("change"))
      .filter(col("change").isNotNull)
  }

  def listSnapshots(backupDir: String, prefix: String): Seq[String] = {
    val dir = Paths.get(backupDir)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(prefix + "_"))
      .toSeq.sorted
  }

  /** Recursive directory delete (also the test/query fixture reset). */
  def deleteRecursive(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
