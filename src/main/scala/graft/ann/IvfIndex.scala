package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, roundScore}
import graft.sources.Store

/** Persisted IVF index — the durable form of [[Ann]]'s query-time pruning,
  * symmetric to [[graft.search.BM25Index]] for the lexical side. The
  * reference keeps its vectors in a Qdrant collection that persists across
  * queries (memory_engine.py:130-156); at cluster scale the analogous
  * structure is a small centroid table plus the assignments written
  * PARTITIONED BY CELL, so a probe is a planning-time partition prune: the
  * scan lists only the `nprobe` probed directories and never touches the
  * other nlist − nprobe cells — not even their parquet footers. AnnSpec
  * pins both the result (bit-equal to the in-memory [[Ann.ivfTopK]]) and
  * the pruning (files read < files stored, PartitionFilters in the scan).
  *
  * Centroids come from [[Ann.centroidsByLabel]] over the embeddings table,
  * so they are a function of that table alone — which is what makes
  * [[refresh]] exact: assigning an append batch against the STORED
  * centroids (classic IVF ingestion — Faiss `add` never moves centroids)
  * yields byte-identical assignments to a full rebuild. */
object IvfIndex {

  /** Build and persist: centroid table + cell-partitioned assignments.
    * Write-then-swap via [[Store.savePartitioned]], same as every other
    * persisted table in the engine. */
  def build(memories: DataFrame, embeddings: DataFrame, path: String,
            idCol: String = "id"): Unit = {
    val cents = Ann.centroidsByLabel(embeddings)
    Store.save(cents, s"$path/centroids")
    Store.savePartitioned(
      Ann.assign(memories.select(col(idCol).as("id"), col("embedding")), cents),
      s"$path/assignments", "ivf_cell")
  }

  /** O(batch) ingestion: assign ONLY the added rows against the stored
    * centroids and publish them into the cell directories. The batch is
    * STAGED first — the long parquet write lands in a sibling tmp dir,
    * never inside the live assignments tree — and only after it completes
    * are the finished files renamed per-cell into place (part-file names
    * carry task UUIDs, so renames never collide with resident files). A
    * mid-write failure therefore leaves the live index byte-identical;
    * the unsafe window shrinks to the metadata renames, the same
    * write-then-swap discipline as [[Store.save]]. (On an HDFS/object-store
    * deployment the rename loop becomes FileSystem.rename per file — same
    * shape, still metadata-only on HDFS.) */
  def refresh(spark: SparkSession, path: String, addedMemories: DataFrame,
              idCol: String = "id"): Unit = {
    val cents = Store.load(spark, s"$path/centroids")
    val staging = s"$path/assignments_batch.tmp"
    Store.deleteRecursive(staging)
    Ann.assign(addedMemories.select(col(idCol).as("id"), col("embedding")), cents)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(staging)
    promoteStagedCells(staging, s"$path/assignments")
    Store.deleteRecursive(staging)
  }

  /** Rename a staged cell-partitioned batch's part files into the live
    * assignments tree (metadata-only moves; task-UUID part names never
    * collide with resident files). Shared by [[refresh]] and
    * [[IvfPqIndex.refresh]]. */
  private[ann] def promoteStagedCells(staging: String, livePath: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    // Files.list holds an open DirectoryStream: drain it under try/finally
    // or a long-lived ingest loop leaks one fd per call per cell dir
    def listDir(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toVector finally s.close()
    }
    val live = Paths.get(livePath)
    listDir(Paths.get(staging))
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("ivf_cell="))
      .foreach { cellDir =>
        val dest = live.resolve(cellDir.getFileName.toString)
        Files.createDirectories(dest)
        listDir(cellDir)
          .filter(_.getFileName.toString.startsWith("part-"))
          .foreach(f => Files.move(f, dest.resolve(f.getFileName.toString)))
      }
  }

  /** The query path: rank stored centroids against the query (a scalar,
    * driver-side job over ≤ [[Ann.MaxNlist]] rows — the same bounded shape
    * as BM25Index's query-term pruning), then scan ONLY those cells.
    * `ivf_cell IN (literals)` on the partition column prunes at planning
    * time. Output matches [[Ann.ivfTopK]]: (id, ivf_cell, sim). */
  def topK(spark: SparkSession, path: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2): DataFrame = {
    val cells = Store.load(spark, s"$path/centroids")
      .withColumn("_qsim", dot(col("centroid"), typedLit(queryVec)))
      .orderBy(desc("_qsim"), asc("label")).limit(nprobe)
      .select("label").collect().map(_.getInt(0)).toSeq
    Store.load(spark, s"$path/assignments")
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col("id"), col("ivf_cell"),
        roundScore(dot(col("embedding"), typedLit(queryVec))).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
