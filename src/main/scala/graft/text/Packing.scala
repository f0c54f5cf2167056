package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate the corpus in a deterministic
  * document order and cut it into fixed token-budget sequences
  * (concat-and-chunk — the standard LLM pretraining packing; documents may
  * straddle a sequence boundary, no padding waste).
  *
  * The only global state is each document's token START OFFSET — a running
  * total over the corpus in id order. A naive `Window.orderBy(id)` cumsum
  * serializes 100 TB through one task, so the offset is computed in two
  * phases exactly like [[graft.ops.Mutations]]' sequential-id assigner:
  * range-partition on the order key (ordered, non-overlapping ranges),
  * cumsum locally per partition, then add per-partition token-total offsets
  * — the offsets pass moves numPartitions scalars through the driver, never
  * rows. The range partitioning is persisted so the totals job and the
  * join-back job provably see identical partition boundaries
  * (RangePartitioner's sample seed derives from the RDD id; two independent
  * executions can place boundary rows differently).
  */
object Packing {

  /** Default sequence budget in BPE-ish tokens. */
  val SeqLen = 512

  /** (id, n_tok, start) — token counts and exclusive-cumsum start offsets in
    * `idCol` order. Zero-token docs keep a (duplicate) offset and are
    * dropped by the caller. */
  /** `checkpoint = false` returns the un-materialized plan so tests can
    * audit the offsets phase (a localCheckpoint hides it behind a Scan
    * ExistingRDD). PLAN INSPECTION ONLY: that branch unpersists the range
    * partitioning immediately, so EXECUTING the returned frame would
    * re-sample partition boundaries independently of the already-collected
    * offsets — only the checkpointed path guarantees correct ids. */
  def tokenOffsets(docs: DataFrame, idCol: String = "id",
                   textCol: String = "text", checkpoint: Boolean = true): DataFrame = {
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    val (_, bpe) = TextAnalysis.tokenCounts(col(textCol))
    val parted = docs
      .select(col(idCol).as("id"), bpe.cast("long").as("n_tok"))
      .repartitionByRange(n, col("id"))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val localCum = parted.withColumn("_lcum",
      sum("n_tok").over(Window.partitionBy("_pid").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = parted.groupBy("_pid").agg(sum("n_tok").as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offsetDf = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(totals.map(_._1).zip(offsets).map {
        case (pid, off) => org.apache.spark.sql.Row(pid, off)
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_off", org.apache.spark.sql.types.LongType))))
    val joined = localCum.join(broadcast(offsetDf), Seq("_pid"))
      .select(col("id"), col("n_tok"),
        (col("_off") + col("_lcum") - col("n_tok")).as("start"))
    if (!checkpoint) { parted.unpersist(); return joined }
    val out = joined.localCheckpoint(true)
    parted.unpersist()
    out
  }

  /** Per-sequence packing manifest: each document occupies global token
    * span [start, start+n_tok) and lands in sequences floor(start/W) ..
    * floor((start+n_tok-1)/W). Output one row per sequence:
    * (seq_id, n_docs, n_tokens, first_doc, last_doc); every sequence holds
    * exactly `seqLen` tokens except the last. */
  def packSequences(docs: DataFrame, seqLen: Int = SeqLen,
                    idCol: String = "id", textCol: String = "text"): DataFrame = {
    val w = lit(seqLen.toLong)
    // `div` (integral division on longs), not floor(x / w): the `/` operator
    // promotes to double, which loses exactness past 2^53 cumulative tokens
    // — the DuckDB oracle's `//` is exact integer division.
    tokenOffsets(docs, idCol, textCol)
      .filter(col("n_tok") > 0)
      .select(col("id"), col("start"), col("n_tok"),
        explode(sequence(expr(s"start div ${seqLen}L"),
          expr(s"(start + n_tok - 1) div ${seqLen}L"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("start") + col("n_tok"), (col("seq_id") + 1) * w)
          - greatest(col("start"), col("seq_id") * w)).as("n_tokens"),
        min("id").as("first_doc"),
        max("id").as("last_doc"))
  }

  /** Deterministic global shuffle into training shards — the layout step
    * between curation and [[packSequences]]: every doc gets a
    * partition-invariant pseudo-random key (the same LCG family as
    * Curation.deterministicSample), its shard is `key mod nShards`, and its
    * position within the shard is the (key, id) order. At scale this IS the
    * shard writer's plan — repartition on shard + sortWithinPartitions —
    * expressed as a window PARTITIONED BY SHARD, so no global sort exists;
    * `nShards` is chosen so one shard fits one writer task, exactly the
    * parameter a 100 TB run tunes. Output: (id, shard, pos). */
  def shuffleShards(docs: DataFrame, nShards: Int = 64,
                    idCol: String = "id"): DataFrame = {
    docs.select(col(idCol).as("id"))
      .withColumn("_k", Curation.lcgBucket(col("id")))
      .withColumn("shard", pmod(col("_k"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_k"), col("id"))).cast("long") - 1)
      .select("id", "shard", "pos")
  }

  /** Fill-in-the-middle transform (Bavarian et al. '22 "Efficient Training
    * of Language Models to Fill in the Middle", public; the PSM
    * serialization code-model pipelines ship): each document with ≥ 3
    * tokens is split into non-empty prefix / middle / suffix at two
    * deterministic pseudo-random cut points and re-serialized as
    * `<fim_prefix>P<fim_suffix>S<fim_middle>M` — the training example that
    * teaches infilling. Cut points come from two classic LCGs on the doc
    * id (the Curation.deterministicSample family), so the transform is a
    * pure function of (id, text): partition-invariant, oracle-exact.
    *
    * Scale shape: map-only — tokenize, two integer hashes, three array
    * slices, one concat, all codegen fused into the scan; no shuffle, no
    * state. Output: (id, n_tok, prefix, middle, suffix, fim). */
  def fimTransform(docs: DataFrame, idCol: String = "id",
                   textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .filter(col("_n") >= 3)
      // prefix end a ∈ [1, n−2]; middle end b ∈ [a+1, n−1] — all three
      // parts non-empty by construction. The id is reduced mod 2³¹ BEFORE
      // the LCG multiply so the product is bounded by 2³¹·1103515245 ≈
      // 2.4e18 < 2⁶³ — no ANSI overflow at any id, instead of an
      // undocumented id < 2⁶³/1103515245 ceiling (mirrored in the oracle)
      .withColumn("_a", lit(1L) + pmod(
        pmod(pmod(col("id"), lit(2147483648L)) * 1103515245L + 12345L,
          lit(2147483648L)),
        col("_n") - 2))
      .withColumn("_b", col("_a") + 1 + pmod(
        pmod(pmod(col("id"), lit(2147483648L)) * 69069L + 1L, lit(2147483648L)),
        col("_n") - col("_a") - 1))
    val pre = concat_ws(" ", slice(col("_t"), lit(1), col("_a").cast("int")))
    val mid = concat_ws(" ",
      slice(col("_t"), (col("_a") + 1).cast("int"), (col("_b") - col("_a")).cast("int")))
    val suf = concat_ws(" ",
      slice(col("_t"), (col("_b") + 1).cast("int"), (col("_n") - col("_b")).cast("int")))
    base.select(col("id"), col("_n").as("n_tok"),
      pre.as("prefix"), mid.as("middle"), suf.as("suffix"),
      concat(lit("<fim_prefix>"), pre, lit("<fim_suffix>"), suf,
        lit("<fim_middle>"), mid).as("fim"))
  }

  /** Sliding token-window chunking with overlap — the ingestion chunker of
    * retrieval/RAG pipelines (fixed window W, stride S < W, so consecutive
    * chunks share W−S tokens of context; public standard practice). Window
    * count is closed-form — 1 + ceil((n−W)/S) for n > W, else 1 — so the
    * operator is one `posexplode(sequence(...))` over a scan: map-side
    * fan-out, no shuffle, no window functions. The final chunk may be
    * shorter (both engines' slice clamps at the array end). Output:
    * (id, chunk_id, n_tok_chunk, chunk_text). */
  def chunkWindows(docs: DataFrame, window: Int = 64, stride: Int = 48,
                   idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(stride > 0 && stride <= window,
      s"chunkWindows needs 0 < stride <= window, got ($window, $stride)")
    val base = docs
      .select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .filter(col("_n") > 0)
      // integer ceildiv with positive operands (the lengthQuantiles
      // discipline): truncating and flooring division agree
      .withColumn("_nw", when(col("_n") <= window, lit(1L))
        .otherwise(lit(1L) + expr(s"(_n - $window + ${stride - 1}) div $stride")))
    base
      .select(col("id"), col("_t"),
        posexplode(sequence(lit(0), (col("_nw") - 1).cast("int"))))
      .select(col("id"), col("col").as("chunk_id"),
        slice(col("_t"), col("col") * stride + 1, lit(window)).as("_c"))
      .select(col("id"), col("chunk_id"),
        size(col("_c")).cast("long").as("n_tok_chunk"),
        concat_ws(" ", col("_c")).as("chunk_text"))
  }
}
