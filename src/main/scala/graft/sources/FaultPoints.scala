package graft.sources

/** Test-only fault injection for multi-table publish sequences.
  *
  * Maintenance paths that publish MORE than one table generation before the
  * sealing [[IndexManifest]] swap call [[hit]] with a named label between
  * the publishes. Production leaves the hook unset (one volatile null
  * check); a spec installs a throwing hook to simulate a crash INSIDE the
  * window and then replays the batch — pinning that the replay hits the
  * fail-loud presence check instead of silently double-appending rows
  * (the crash windows the exactly-once batch-id stamp alone cannot close,
  * because the stamp is only written by the FINAL manifest swap).
  */
object FaultPoints {
  @volatile private var hook: String => Unit = null

  /** Install a hook (specs only). Pass null to clear. */
  private[graft] def install(h: String => Unit): Unit = { hook = h }

  /** Fire the named fault point — no-op unless a hook is installed. */
  def hit(label: String): Unit = {
    val h = hook
    if (h != null) h(label)
  }
}
