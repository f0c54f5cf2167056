package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Visibility / temporal predicates (SURVEY.md §2.3, F1-F6).
  *
  * All are plain Catalyst predicates so they push down into the parquet scan
  * (the reference compiles the same filters into Qdrant payload filters,
  * memory_engine.py:1322-1381; payload indexes qdrant_store.py:136-173).
  */
object Filters {

  /** F1: source prefix match (memory_engine.py:1322-1362). */
  def sourcePrefix(prefix: Option[String]): Column =
    prefix.map(p => col("source").startsWith(p)).getOrElse(lit(true))

  /** F2: exclude archived unless asked (memory_engine.py:1364-1381);
    * null-safe — a missing flag counts as not archived. */
  def notArchived(includeArchived: Boolean): Column =
    if (includeArchived) lit(true)
    else !coalesce(col("archived"), lit(false))

  /** F5: pinned filter. */
  def pinnedIs(pinned: Option[Boolean]): Column =
    pinned.map(p => coalesce(col("pinned"), lit(false)) === p).getOrElse(lit(true))

  /** F4: temporal window on the best-available document date.
    * Date precedence document_at ?? created_at ?? updated_at; rows with no
    * parseable date PASS (memory_engine.py:1467-1488). */
  def temporal(since: Option[String], until: Option[String]): Column = {
    val d = coalesce(col("document_at"), col("created_at"), col("updated_at"))
    val lo = since.map(s => d >= to_timestamp(lit(s))).getOrElse(lit(true))
    val hi = until.map(u => d <= to_timestamp(lit(u))).getOrElse(lit(true))
    // null date ⇒ both comparisons are NULL ⇒ pass explicitly
    d.isNull || (lo && hi)
  }

  /** Composite visibility filter used by every retrieval branch. */
  def visible(
      prefix: Option[String] = None,
      includeArchived: Boolean = false,
      since: Option[String] = None,
      until: Option[String] = None,
      pinned: Option[Boolean] = None): Column =
    sourcePrefix(prefix) && notArchived(includeArchived) &&
      temporal(since, until) && pinnedIs(pinned)

  def apply(df: DataFrame, pred: Column): DataFrame = df.filter(pred)
}
