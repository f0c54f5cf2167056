package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** One generation pointer for a WHOLE multi-table index (the r10 verdict's
  * cross-table atomicity item): [[graft.search.BM25Index]] persists four
  * tables and [[graft.ann.IvfIndex]] two, each with its own [[Store]]
  * pointer — so a reader planning mid-refresh could pair new postings with
  * old scalars (BM25Index documented the hole as the caller's batch
  * boundary). This closes it the way a table format's commit log does
  * (Delta's _last_checkpoint / Iceberg's version-hint, public designs):
  * one index-level manifest that NAMES each member table's generation,
  * swapped by a single atomic pointer PUT.
  *
  * Layout under the index root `path`:
  *
  *   path/INDEX                   the live index generation (single-key
  *                                atomic PUT, the only overwritten file)
  *   path/index-manifests/gen-K   lines `table=G` (member table generation
  *                                pins) and optionally `batch=B` (the last
  *                                applied streaming micro-batch — the
  *                                exactly-once replay guard, see
  *                                [[graft.streaming.EventStream]])
  *
  * Writers publish member tables first (each through its own Store swap —
  * invisible to index readers until the index pointer moves), then
  * [[capture]] the resulting generations into one new index manifest.
  * Readers [[resolve]] the index pointer ONCE at planning and
  * [[Store.loadAt]] every member at its pinned generation: the quadruple
  * is consistent — all-old or all-new, never mixed. The previous index
  * generation stays resolvable because each maintenance call advances each
  * member table by at most one generation and Store's prune keeps a
  * one-generation grace window.
  */
object IndexManifest {

  private val PointerName = "INDEX"
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** A resolved index generation: member-table generation pins + the last
    * applied streaming batch id (None before any stamped batch). */
  case class State(gen: Int, tables: Map[String, Int], lastBatch: Option[Long])

  def current(path: String): Option[State] = {
    val ptr = Paths.get(path, PointerName)
    if (!Files.exists(ptr)) None
    else {
      val gen = new String(Files.readAllBytes(ptr), Utf8).trim.toInt
      val lines = Files.readAllLines(Paths.get(path, "index-manifests", s"gen-$gen"))
        .asScala.map(_.trim).filter(_.nonEmpty).toSeq
      val tables = lines.filterNot(_.startsWith("batch="))
        .map { l => val Array(t, g) = l.split("=", 2); t -> g.toInt }.toMap
      val batch = lines.find(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
      Some(State(gen, tables, batch))
    }
  }

  /** Publish a new index generation pinning `tables` (name → Store
    * generation), carrying forward the last stamped batch id unless
    * `batchId` supersedes it. Write-manifest-then-swap-pointer, identical
    * discipline to [[Store]]. */
  def publish(path: String, tables: Map[String, Int],
              batchId: Option[Long] = None): Unit = {
    val prev = current(path)
    val gen = prev.map(_.gen).getOrElse(0) + 1
    val batch = batchId.orElse(prev.flatMap(_.lastBatch))
    Files.createDirectories(Paths.get(path, "index-manifests"))
    val lines = tables.toSeq.sortBy(_._1).map { case (t, g) => s"$t=$g" } ++
      batch.map(b => s"batch=$b")
    Files.write(Paths.get(path, "index-manifests", s"gen-$gen"),
      lines.mkString("\n").getBytes(Utf8))
    val tmp = Paths.get(path, PointerName + ".tmp")
    Files.write(tmp, gen.toString.getBytes(Utf8))
    Files.move(tmp, Paths.get(path, PointerName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // prune index manifests older than the grace window (mirrors Store)
    val dir = Paths.get(path, "index-manifests")
    val s = Files.list(dir)
    try s.iterator().asScala.toVector
      .filter(_.getFileName.toString.stripPrefix("gen-").toIntOption.exists(_ < gen - 1))
      .foreach(Files.delete)
    finally s.close()
  }

  /** Read each member table's CURRENT Store generation and publish an index
    * manifest pinning exactly those — the closing step of every index
    * maintenance call. Member tables not yet generational (plain dirs) are
    * recorded as generation 0 and resolved by a plain [[Store.load]]. */
  def capture(path: String, tableNames: Seq[String],
              batchId: Option[Long] = None): Unit =
    publish(path, tableNames.map { t =>
      t -> Store.currentManifest(s"$path/$t").map(_._1).getOrElse(0)
    }.toMap, batchId)

  /** Republish the CURRENT table pins with `batchId` stamped — the
    * streaming path's applied-batch record, folded into the same single
    * pointer swap readers resolve (so the stamp and the index state can
    * never be observed separately). */
  def stampBatch(path: String, batchId: Long): Unit = {
    val st = current(path).getOrElse(
      throw new IllegalArgumentException(s"stampBatch: $path has no index manifest"))
    publish(path, st.tables, Some(batchId))
  }

  def lastBatch(path: String): Option[Long] = current(path).flatMap(_.lastBatch)

  /** The reader side: a loader returning member table `t` at the pinned
    * generation of ONE resolution of the index pointer — every table the
    * caller loads through it came from the same index generation. Falls
    * back to live per-table loads for pre-manifest layouts. */
  def resolve(spark: org.apache.spark.sql.SparkSession,
              path: String): String => org.apache.spark.sql.DataFrame =
    loaderOf(spark, path, current(path))

  private def loaderOf(spark: org.apache.spark.sql.SparkSession, path: String,
                       st: Option[State]): String => org.apache.spark.sql.DataFrame =
    st match {
      case Some(s) => t =>
        s.tables.get(t) match {
          case Some(0) | None => Store.load(spark, s"$path/$t")
          case Some(g) => Store.loadAt(spark, s"$path/$t", g)
        }
      case None => t => Store.load(spark, s"$path/$t")
    }

  /** Resolve SEVERAL indexes to ONE mutually consistent epoch — the
    * multi-index upgrade of [[resolve]] (r13 verdict #7): each index's
    * manifest swap is atomic, but a query racing a maintenance publish
    * could pair BM25-at-batch-N with IVF-at-batch-N−1 (the documented
    * ≤1-micro-batch cross-index skew). This reads every index's state,
    * and RETRIES while their batch stamps disagree — the writer stamps
    * every index before the next batch starts (CrossIndexSkewSpec), so a
    * mid-publish read converges within one publish window. The returned
    * loaders are FROZEN at the agreeing states: a publish happening after
    * resolveAll returns cannot be observed through them, so a reader can
    * never see mixed stamps. Unstamped indexes (no streaming batch ever
    * applied — the batch-build case) are exempt from the agreement check:
    * they carry no epoch to disagree about. Fail-louds after `maxRetries`
    * (stamps that never converge mean a stalled or dead writer mid-batch
    * — retrying forever would hang the query instead of surfacing it). */
  def resolveAll(spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
                 maxRetries: Int = 20)
      : Map[String, String => org.apache.spark.sql.DataFrame] = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val states = paths.map(p => p -> current(p))
      val stamps = states.flatMap(_._2.flatMap(_.lastBatch)).distinct
      if (stamps.size <= 1)
        return states.map { case (p, st) => p -> loaderOf(spark, p, st) }.toMap
      attempt += 1
      Thread.sleep(math.min(25L * attempt, 250L))
    }
    throw new IllegalStateException(
      s"resolveAll: index batch stamps still disagree after $maxRetries " +
        "retries — " +
        paths.map(p => s"$p=${lastBatch(p).getOrElse("unstamped")}")
          .mkString(", ") +
        "; the cross-index skew is bounded by one micro-batch only while " +
        "the maintenance writer is live — a permanent disagreement means " +
        "it died mid-batch: replay the batch before serving queries")
  }
}
