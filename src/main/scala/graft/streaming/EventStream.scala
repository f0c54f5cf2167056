package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming layer: the reference's event bus is a bounded in-memory ring
  * feeding SSE/webhooks (event_bus.py:47-97) and its usage logs are
  * append-only tables (usage_tracker.py) — on Spark both map onto Structured
  * Streaming over an append-only event source.
  *
  * Two production shapes:
  *  - windowed usage analytics: watermarked sliding-window counts per event
  *    type (the streaming form of [[graft.analytics.Analytics.searchQuality]]);
  *  - running feedback nets via `flatMapGroupsWithState` — the incremental
  *    form of the R6 feedback signal, so the batch RRF pipeline can read an
  *    always-current feedback table instead of re-aggregating history.
  *
  * Transformations are defined on DataFrames, so every function here works
  * identically on a batch frame (tests/oracles) and a `readStream` frame.
  */
object EventStream {

  /** Watermarked per-type tumbling-window counts (event-bus analytics). */
  def windowedEventCounts(events: DataFrame,
                          window: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Gap-based sessionization of the usage log — the canonical stateful
    * analytics shape over an event stream: consecutive events of a user
    * belong to one session while the gap stays under `gapUs` (30 min
    * default, the industry-standard web-analytics cutoff). This is the
    * BATCH form (lag + running-sum islands, windows partitioned per user —
    * no global order); [[sessionizeStream]] is the same state machine under
    * an event-time timeout. Output: (user_id, session_idx, n_events,
    * start_us, dur_us) — epoch-microsecond longs, exact in both engines. */
  def sessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("_us"))
      .withColumn("_new", when(lag("_us", 1).over(w).isNull ||
        col("_us") - lag("_us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("_new").over(upTo))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("_us").as("start_us"),
        (max("_us") - min("_us")).as("dur_us"))
  }

  // `ts` rides along only to keep the watermark tag attached through the
  // projection (the event-time-timeout checker requires it on the stateful
  // operator's input); the state machine itself works in epoch micros
  case class SessEvent(userId: Long, eventId: Long, us: Long,
                       ts: java.sql.Timestamp)
  case class SessState(nextIdx: Long, startUs: Long, lastUs: Long,
                       nEvents: Long, open: Boolean)
  case class Session(user_id: Long, session_idx: Long, n_events: Long,
                     start_us: Long, dur_us: Long)

  /** Streaming form of [[sessionize]]: the SAME gap state machine run
    * incrementally under an event-time timeout. A user's open session
    * closes (emits) either when a later event arrives past the gap, or
    * when the watermark passes last-event-time + gap (the timeout path —
    * no later event needed). Session indices are sequential per user
    * across the whole stream; the per-user counter survives timeouts, so
    * indices match the batch form's running-sum islands exactly.
    *
    * Scale shape: state is one tiny fixed-size record per ACTIVE user
    * (closed sessions leave only the counter), partitioned by user_id —
    * the same no-global-order property as the batch form. On a batch
    * frame the function answers identically for every CLOSED session
    * (timeouts never fire in batch, so each user's trailing open session
    * is withheld — StreamingSpec pins stream ≡ batch on that subset). */
  def sessionizeStream(events: DataFrame, gapUs: Long = 1800L * 1000000L,
                       watermark: String = "0 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[SessEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            // close the open session, keep the index counter (no new
            // timeout: nothing is open until the user's next event)
            state.update(SessState(s.nextIdx + 1, 0L, 0L, 0L, open = false))
            Iterator.single(
              Session(uid, s.nextIdx, s.nEvents, s.startUs, s.lastUs - s.startUs))
          } else {
            // batch-internal order mirrors the batch window: (us, event_id)
            val sorted = evs.toSeq.sortBy(e => (e.us, e.eventId))
            var st = state.getOption
              .getOrElse(SessState(1L, 0L, 0L, 0L, open = false))
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              if (st.open && e.us - st.lastUs <= gapUs)
                st = st.copy(lastUs = e.us, nEvents = st.nEvents + 1)
              else {
                if (st.open) {
                  out += Session(uid, st.nextIdx, st.nEvents, st.startUs,
                    st.lastUs - st.startUs)
                  st = SessState(st.nextIdx + 1, e.us, e.us, 1L, open = true)
                } else st = SessState(st.nextIdx, e.us, e.us, 1L, open = true)
              }
            }
            state.update(st)
            // ceiling-ms of the true micro deadline: flooring each term
            // separately could fire the timeout up to ~2ms EARLY, splitting
            // a session an on-time boundary event should have extended
            if (st.open)
              state.setTimeoutTimestamp((st.lastUs + gapUs + 999L) / 1000L)
            out.result().iterator
          }
      }
      .toDF()
  }

  /** Interval join of two event frames — every click paired with EVERY
    * view by the same user inside the preceding `toleranceUs` window
    * (inclusive both ends), the stream-stream attribution shape
    * Structured Streaming supports natively: an equi-key (user) plus a
    * bounded event-time range condition. On BATCH frames it is one
    * shuffled equi-join with the range as a post-predicate; on STREAMING
    * frames (callers attach `withWatermark` on both inputs first) the
    * same plan becomes Spark's watermarked stream-stream inner join — the
    * time bound is exactly what lets each side's buffered state be
    * dropped once the other side's watermark passes, so state stays
    * O(tolerance × rate), not O(stream). Inner-join matches emit as soon
    * as both rows have arrived (no watermark wait), which is what the
    * stream ≡ batch spec exercises.
    *
    * Output: (user_id, click_id, view_id, gap_us ≥ 0). */
  def clickViewPairs(clicks: DataFrame, views: DataFrame,
                     toleranceUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    val c = clicks.select(col("user_id"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val v = views.select(col("user_id").as("_vu"),
      col("event_id").as("view_id"), col("ts").as("v_ts"))
    c.join(v,
        col("user_id") === col("_vu") &&
          col("v_ts") <= col("c_ts") &&
          col("v_ts") >= col("c_ts") - expr(s"INTERVAL $toleranceUs MICROSECOND"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  case class FeedbackEvent(memoryId: Long, signal: String, tsMicros: Long)
  case class FeedbackNet(memoryId: Long, net: Long, nEvents: Long)

  /** Running feedback net per memory via mapGroupsWithState — incremental
    * R6 (usage_tracker.py:324-342 as a stream). */
  def runningFeedbackNets(feedback: DataFrame): DataFrame = {
    val spark = feedback.sparkSession
    import spark.implicits._
    feedback
      .select(col("memory_id").as("memoryId"), col("signal"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[FeedbackEvent]
      .groupByKey(_.memoryId)
      .mapGroupsWithState[FeedbackNet, FeedbackNet](GroupStateTimeout.NoTimeout) {
        (id: Long, events: Iterator[FeedbackEvent], state: GroupState[FeedbackNet]) =>
          val prev = state.getOption.getOrElse(FeedbackNet(id, 0L, 0L))
          val delta = events.foldLeft((0L, 0L)) { case ((net, n), e) =>
            (net + (if (e.signal == "useful") 1L else -1L), n + 1)
          }
          val next = FeedbackNet(id, prev.net + delta._1, prev.nEvents + delta._2)
          state.update(next)
          next
      }
      .toDF()
  }

  /** Ingest-quality monitor: per tumbling window of document arrival time,
    * the corpus-health numbers an ingest dashboard watches — document
    * count, mean quality (exact integer micro-unit sum, one closing
    * division), low-quality fraction, and distinct languages. A quality
    * collapse or language-mix shift inside one window is the first sign
    * of a broken scraper or an upstream format change — at 100 TB you
    * want that signal per window, not after the next full profile.
    *
    * Defined on a DataFrame so the SAME code runs as a watermarked
    * streaming aggregation (append mode once the watermark passes) and as
    * the batch oracle form. The aggregate is one map-side-combined
    * groupBy(window) — sketch-free, bounded state per open window. */
  def qualityWindowStats(docs: DataFrame,
                         window: String = "1 day",
                         watermark: String = "2 days",
                         lowQuality: Double = 0.5,
                         tsCol: String = "created_at"): DataFrame = {
    val q = graft.text.TextAnalysis.qualityScore(col("text"))
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col("lang"),
        round(q * 1e6, 0).cast("long").as("_qm"))
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_docs"),
        sum("_qm").as("_qsum"),
        sum(when(col("_qm") < lowQuality * 1e6, 1L).otherwise(0L)).as("_nlow"),
        // collect_set, not count_distinct: distinct aggregates are
        // rejected in streaming mode, the set (bounded by the language
        // cardinality) is legal in both and exact
        collect_set(col("lang")).as("_langs"))
      // integer half-up division — (2a + b) div 2b — for both ratios: a
      // double mean can land EXACTLY on a .XXXXXX5 tie (sum/1e6/n with
      // small n), where Spark's BigDecimal HALF_UP and a multiply-then-
      // nearbyint round disagree by 1 ulp; integer arithmetic cannot.
      // mean quality in micro-units, low-quality share in ppm.
      .select(col("window.start").as("window_start"),
        col("n_docs"),
        expr("(2 * _qsum + n_docs) div (2 * n_docs)").as("mean_quality_micro"),
        expr("(2 * 1000000 * _nlow + n_docs) div (2 * n_docs)").as("low_quality_ppm"),
        size(col("_langs")).cast("long").as("n_langs"))
  }

  /** Streaming index maintenance (r9 verdict #8 — the r6_feedback_stream
    * discipline applied to the index tier): each micro-batch of newly
    * ingested documents lands in the persisted indexes via foreachBatch →
    * [[refreshBatch]] → [[graft.search.BM25Index.refresh]] /
    * [[graft.ann.IvfIndex.refresh]]. Every micro-batch is one O(batch)
    * generation publish, so a concurrent reader sees the index before or
    * after the whole micro-batch, never mid-batch — the streaming ingest
    * path inherits the atomicity the batch path already proves
    * (`ann_ivf_multigen`). EXACTLY-ONCE: foreachBatch re-delivers a batch
    * after a crash; [[refreshBatch]] consults each index's
    * [[graft.sources.IndexManifest.lastBatch]] stamp and SKIPS any index
    * that already applied this batchId — per index, so a crash between
    * the two index updates replays only the unapplied one. StreamingSpec
    * drives two real MemoryStream micro-batches, pins stream-fed ≡
    * one-shot batch build, and pins a re-delivered batch as a no-op. */
  def startIndexRefresh(docs: DataFrame, bm25Path: Option[String],
                        ivfPath: Option[String],
                        checkpoint: String,
                        auditEvery: Int = 0): StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        refreshBatch(batch, batchId, bm25Path, ivfPath, auditEvery)
      }
      .start()

  /** True iff the index at `path` has already applied `batchId` — the
    * one-file read that turns foreachBatch's at-least-once re-delivery
    * into exactly-once index maintenance. */
  private def applied(path: String, batchId: Long): Boolean =
    graft.sources.IndexManifest.lastBatch(path).exists(_ >= batchId)

  /** The maintenance cadence shared by the drift audit and the BM25
    * avg-idf recompute: fires every `auditEvery` micro-batches — and on
    * EVERY batch when no cadence is configured (auditEvery ≤ 0), so the
    * bounded-staleness skip is strictly opt-in. */
  private def onAuditCadence(batchId: Long, auditEvery: Int): Boolean =
    auditEvery <= 0 || (batchId + 1) % auditEvery == 0

  /** The per-micro-batch body of [[startIndexRefresh]], public so the
    * replay spec can drive it directly: refresh each index UNLESS its
    * manifest already stamps this (or a later) batchId. `auditEvery` > 0
    * runs [[graft.ann.IvfIndex.retrainIfDrifted]] every that-many
    * micro-batches AFTER the apply — the unattended drift loop (cheap
    * 2-column audit scan on a cadence, O(flagged) retrain when it fires).
    * The trigger deliberately ignores the replay guard: right after a
    * retrain the re-seeded baseline reads clean, so a replayed cadence
    * firing no-ops instead of double-retraining. */
  def refreshBatch(batch: DataFrame, batchId: Long,
                   bm25Path: Option[String], ivfPath: Option[String],
                   auditEvery: Int = 0): Unit = {
    val b = batch.persist()
    try {
      if (!b.isEmpty) {
        bm25Path.filterNot(applied(_, batchId)).foreach(p =>
          graft.search.BM25Index.refresh(b.sparkSession, p, b,
            batchId = Some(batchId),
            recomputeAvgIdf = onAuditCadence(batchId, auditEvery)))
        ivfPath.filterNot(applied(_, batchId)).foreach(p =>
          graft.ann.IvfIndex.refresh(b.sparkSession, p, b,
            batchId = Some(batchId)))
      }
      if (auditEvery > 0 && (batchId + 1) % auditEvery == 0)
        ivfPath.foreach(p =>
          graft.ann.IvfIndex.retrainIfDrifted(b.sparkSession, p))
    } finally { b.unpersist(); () }
  }

  /** The streaming form of the composed add path
    * ([[graft.ops.IngestGateway]]): each micro-batch of incoming documents
    * is GATED against the pre-add store's IVF index (novelty per row from
    * one probed scan — the reference's is_novel-per-add, batch-shaped) and
    * only the passing rows land in the indexes, one refresh generation per
    * index per micro-batch under the same exactly-once batch stamp as
    * [[startIndexRefresh]]. This is the live deployment shape of the
    * reference's `add_memories` service loop: crawl feed in, deduplicated
    * indexed store out, no corpus rescans anywhere on the path. */
  def startGatedIngest(docs: DataFrame, bm25Path: String, ivfPath: String,
                       checkpoint: String,
                       lshPath: Option[String] = None,
                       noveltyThreshold: Double = 0.88,
                       auditEvery: Int = 0,
                       reportPath: Option[String] = None,
                       dedupWithinBatch: Boolean = false,
                       nprobe: Int = 2): StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gatedIngestBatch(batch, batchId, bm25Path, ivfPath, lshPath,
          noveltyThreshold, auditEvery, reportPath, dedupWithinBatch, nprobe)
      }
      .start()

  /** The per-micro-batch body of [[startGatedIngest]], public so the
    * replay spec can drive it directly. The per-index batch stamps inside
    * [[graft.ops.IngestGateway.ingestBatch]] make a re-delivered batch's
    * writes no-ops (the IVF probe source refreshes LAST, so a mid-crash
    * replay recomputes the identical gate); `reportPath` optionally
    * persists each batch's FIRST gate report under its stamp for
    * downstream decision consumers; `auditEvery` runs the drift loop as
    * in [[refreshBatch]]. */
  def gatedIngestBatch(batch: DataFrame, batchId: Long,
                       bm25Path: String, ivfPath: String,
                       lshPath: Option[String] = None,
                       noveltyThreshold: Double = 0.88,
                       auditEvery: Int = 0,
                       reportPath: Option[String] = None,
                       dedupWithinBatch: Boolean = false,
                       nprobe: Int = 2): Unit = {
    val b = batch.persist()
    try {
      if (!b.isEmpty)
        graft.ops.IngestGateway.ingestBatch(b.sparkSession, b,
          bm25Path, ivfPath, lshPath, noveltyThreshold,
          nprobe = nprobe, batchId = Some(batchId), reportPath = reportPath,
          dedupWithinBatch = dedupWithinBatch)
      if (auditEvery > 0 && (batchId + 1) % auditEvery == 0)
        graft.ann.IvfIndex.retrainIfDrifted(b.sparkSession, ivfPath)
    } finally { b.unpersist(); () }
  }

  /** CDC-typed streaming maintenance — [[startIndexRefresh]] extended to
    * the full change-data shape a re-crawling pipeline emits: each
    * micro-batch row carries `op` ∈ add | update | delete (plus id, text,
    * embedding for add/update, and optionally `seq`, the CDC offset/LSN).
    * Each micro-batch first REDUCES to the last event per id (when a seq
    * column orders the feed — the Debezium-compaction step, so
    * delete-then-re-add ends live and double-updates can't collide), then
    * applies as ONE combined pass per index
    * ([[graft.search.BM25Index.applyCdc]] /
    * [[graft.ann.IvfIndex.applyCdc]]): one generation per table, one
    * manifest swap per index per micro-batch — readers and crashes see a
    * whole micro-batch applied or not at all, per index. Replayed batches
    * skip via the same [[graft.sources.IndexManifest.lastBatch]] guard as
    * [[refreshBatch]]. `st_cdc_maintenance` oracles the batch form
    * against full-recompute SQL over the post-CDC corpus; StreamingSpec
    * drives the real MemoryStream form, the replay no-op, and the
    * in-batch add→delete→add ordering. */
  def startCdcMaintenance(docs: DataFrame, bm25Path: String, ivfPath: String,
                          checkpoint: String,
                          lshPath: Option[String] = None,
                          auditEvery: Int = 0): StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cdcBatch(batch, batchId, bm25Path, ivfPath, lshPath, auditEvery)
      }
      .start()

  /** The per-micro-batch body of [[startCdcMaintenance]], public so the
    * replay spec can drive it directly. `auditEvery` as in
    * [[refreshBatch]]: the IVF drift audit + targeted retrain runs every
    * that-many micro-batches after the CDC apply — and the BM25 avg-idf
    * recompute (the one O(vocab) agg per maintenance call) rides the SAME
    * cadence: off-cadence batches inside the 0.1% drift bound keep the
    * stored epsilon base ([[graft.search.BM25Index]]'s bounded-staleness
    * skip); with no cadence configured every batch recomputes. */
  def cdcBatch(batch: DataFrame, batchId: Long,
               bm25Path: String, ivfPath: String,
               lshPath: Option[String] = None,
               auditEvery: Int = 0): Unit = {
    val b = batch.persist()
    try {
      if (!applied(bm25Path, batchId) || !applied(ivfPath, batchId) ||
        lshPath.exists(!applied(_, batchId)))
        applyCdcBatch(b, bm25Path, ivfPath, batchId = Some(batchId),
          lshPath = lshPath,
          recomputeAvgIdf = onAuditCadence(batchId, auditEvery))
      if (auditEvery > 0 && (batchId + 1) % auditEvery == 0)
        graft.ann.IvfIndex.retrainIfDrifted(b.sparkSession, ivfPath)
    } finally { b.unpersist(); () }
  }

  /** The CDC dispatch, also the batch/oracle form: reduce the batch to
    * its last event per id (when ordered by `seqCol`, defaulting to a
    * `seq` column if present), split into changed (add | update — the
    * index decides add-vs-update by presence, so a re-crawl mislabeled
    * `add` still lands correctly) and deleted slices, and apply each index
    * in ONE combined maintenance pass. Without a seq column, a batch
    * carrying the same id twice fail-louds inside applyCdc (unordered
    * duplicates are ambiguous); with one, two events of an id SHARING the
    * winning seq also fail-loud (no deterministic winner — a replay could
    * land a different state); deletes that reduce from an
    * in-batch add+delete of a never-indexed id are legitimately absent
    * from the index, so the delete-presence check relaxes. When `batchId`
    * is given, an index whose manifest already stamps it is skipped — the
    * exactly-once guard, applied per index. */
  def applyCdcBatch(batch: DataFrame, bm25Path: String, ivfPath: String,
                    batchId: Option[Long] = None,
                    seqCol: Option[String] = None,
                    lshPath: Option[String] = None,
                    recomputeAvgIdf: Boolean = true): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val ordered = seqCol.orElse(Option("seq").filter(batch.columns.contains))
    val last = ordered match {
      case Some(sc) =>
        // fail loud when the WINNING offset is duplicated: two events for
        // one id sharing the max seq (plausible for CDC feeds that stamp a
        // shared LSN/commit-ts) have no deterministic winner — picking one
        // arbitrarily would let a replay land a DIFFERENT index state than
        // the original run, breaking replay ≡ once. Ties below the winner
        // are harmless (the reduction never reads them). The check rides
        // the same window pass — no extra job.
        val w = Window.partitionBy("id").orderBy(desc(sc))
        val ties = Window.partitionBy(col("id"), col(sc))
        batch.withColumn("_rn", row_number().over(w))
          .withColumn("_nt", count(lit(1)).over(ties))
          .filter(col("_rn") === 1)
          .withColumn("id", when(col("_nt") > 1, raise_error(concat(
            lit("applyCdcBatch: duplicate (id, seq) at the winning offset for id "),
            col("id").cast("string"),
            lit(" — the last-event-per-id reduction is ambiguous; give the " +
              "feed a total per-id order (unique seq) or pre-reduce it"))))
            .otherwise(col("id")))
          .drop("_rn", "_nt")
      case None => batch
    }
    val changed = last.filter(col("op").isin("add", "update"))
      .select("id", "text", "embedding")
    val dels = last.filter(col("op") === "delete").select("id")
    val strictDeletes = ordered.isEmpty
    if (!batchId.exists(applied(bm25Path, _)))
      graft.search.BM25Index.applyCdc(spark, bm25Path, changed, dels,
        batchId = batchId, requireDeletesPresent = strictDeletes,
        recomputeAvgIdf = recomputeAvgIdf)
    // CROSS-INDEX SKEW BOUND: the indexes publish sequentially, so a query
    // resolving both manifests mid-dispatch can pair BM25-at-batch-N with
    // IVF-at-batch-N−1 — never more: each batch stamps every index before
    // the next batch starts, so the stamps diverge by AT MOST one
    // micro-batch at any instant (pinned by CrossIndexSkewSpec via this
    // fault point). Per-index atomicity is absolute (one manifest swap per
    // index); readers that need a perfectly aligned pair read during a
    // quiet period or re-resolve until the stamps agree.
    graft.sources.FaultPoints.hit("cdc.betweenIndexApplies")
    if (!batchId.exists(applied(ivfPath, _)))
      graft.ann.IvfIndex.applyCdc(spark, ivfPath, changed, dels,
        batchId = batchId, requireDeletesPresent = strictDeletes)
    lshPath.filterNot(p => batchId.exists(applied(p, _))).foreach(p =>
      graft.dedup.LshIndex.applyCdc(spark, p,
        changed.select("id", "text"), dels, batchId = batchId))
  }

  /** Wire a file-based event stream end-to-end (readStream → transform →
    * memory sink); used by the streaming spec and as the deployment shape. */
  def startWindowedCounts(spark: SparkSession, sourceDir: String,
                          queryName: String): StreamingQuery = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val stream = spark.readStream.schema(schema).json(sourceDir)
    windowedEventCounts(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .start()
  }
}
