package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHashLsh}
import graft.functions.TextFunctions

/** End-to-end training-data curation pipeline over an (id, text) corpus —
  * the composition a 100 TB pre-training data run would execute:
  *
  *   profile (language-ID + quality + token counts, [[TextAnalysis]])
  *     → threshold filter (target language, min quality, min tokens)
  *     → exact dedup on whitespace-normalized text ([[Dedup.dedupExact]])
  *     → MinHash-LSH near-dup removal ([[MinHashLsh.nearDuplicates]],
  *       drop the higher id of each pair — D3 semantics,
  *       reference memory_engine.py:2239-2272).
  *
  * Scale shape: the profile stage is pure codegen column math fused into the
  * scan (one pass, no shuffle); the filter prunes before anything shuffles;
  * exact dedup is one hash-partitioned window on the normalized key; the
  * near-dup stage shuffles only (band, key) buckets — the quadratic pair
  * space never materializes. Nothing collects to the driver.
  */
object Curation {

  /** The pipeline's stage frames, exposed for funnel metrics and audits. */
  case class Stages(profiled: DataFrame, kept: DataFrame, exact: DataFrame,
                    pairs: DataFrame, survivors: DataFrame)

  /** Profile stage alone (lazy, no jobs triggered): per-row language,
    * quality, token counts. Rows whose text has no tokens are dropped
    * (un-profileable).
    *
    * The heavy expression trees (langId's stopword scans, the quality
    * components) read the text through [[graft.expressions.Opaque]] — the
    * guide-§4.4 optimizer barrier: without it, every downstream filter on
    * the derived columns is pushed below the CPU-fan-out repartition onto
    * the single-split documents scan (profiled: the whole profile
    * condition serialized on ONE core for 1.5-2.5 s per execution at
    * sf0.1) and the trees are evaluated AGAIN in the projection above the
    * filter. Values are bit-identical (Opaque is a runtime identity); the
    * zero-token drop is expressed on the projected n_ws — the same
    * size(tokens(text)) — so it stays above the projection too.
    *
    * The barrier also blocks pushdown of DETERMINISTIC filters (id = x)
    * and partition pruning through the projection (r17 ADVICE) — right
    * for the curate()/funnel() pipelines, which evaluate the full profile
    * anyway, wrong for a selective ad-hoc read: pass `barrier = false`
    * there to trade duplicated tree evaluation for scan-level pruning. */
  def profile(docs: DataFrame, barrier: Boolean = true): DataFrame = {
    val txt =
      if (barrier) graft.expressions.Opaque(col("text")) else col("text")
    val li = TextAnalysis.langId(txt)
    val (ws, bpe) = TextAnalysis.tokenCounts(txt)
    docs
      .select(col("id"), col("text"),
        li.getField("lang").as("lang"),
        TextAnalysis.qualityScore(txt).as("quality"),
        ws.as("n_ws"), bpe.as("n_bpe"))
      .filter(col("n_ws") > 0)
  }

  /** Signal-agreement audit: Pearson correlation between the heuristic
    * quality score and unigram-LM fluency (NLL) per document — the
    * "measure, don't guess" check before trusting the cheap heuristic as
    * a proxy for the expensive LM signal in a curation run (FineWeb-style
    * ablation practice, public). A strongly negative r (high quality ↔
    * low NLL) licenses filtering on the heuristic alone; r near 0 says
    * the two filters remove different documents and both gates earn
    * their keep.
    *
    * Determinism: quality rides in exact integer micro-units (it is
    * already 6dp-rounded), NLL in milli-units; the five sums are
    * order-free BIGINT aggregates (Σx² ≤ 1e12·n — exact below ~9e6 docs;
    * at larger corpora run the audit on a bounded sample, which is how
    * a correlation audit is used anyway) and the closing Pearson
    * arithmetic is ONE mirrored double expression. Output: one row
    * (n_docs, corr). */
  def qualityFluencyCorr(docs: DataFrame): DataFrame = {
    val q = profile(docs).select(col("id"),
      round(col("quality") * 1e6, 0).cast("long").as("x"))
    val f = TextAnalysis.unigramNll(docs).select(col("id"),
      round(col("nll") * 1e3, 0).cast("long").as("y"))
    def d(c: String) = col(c).cast("double")
    q.join(f, "id")
      .agg(count(lit(1)).as("n_docs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n_docs"),
        round((d("n_docs") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n_docs") * d("sxx") - d("sx") * d("sx")) *
            (d("n_docs") * d("syy") - d("sy") * d("sy"))), 6).as("corr"))
  }

  /** Run the pipeline. `docs` needs (id, text). NOTE: the near-dup stage
    * materializes its shingle frame eagerly (checkpoint), so calling this
    * runs jobs; use [[profile]] for profile-only consumers. */
  def curate(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
             minTokens: Int = 10, jaccardThreshold: Double = 0.2): Stages = {
    val profiled = profile(docs)
    val kept = profiled.filter(
      col("lang") === lang && col("quality") >= minQuality && col("n_ws") >= minTokens)
    // _norm is retained on the exact frame: it IS the incremental state key
    // (curateIncrement anti-joins new keys against it without re-tokenizing
    // the old corpus); registered queries project explicit columns
    val exact = Dedup.dedupExact(
      kept.withColumn("_norm", array_join(TextFunctions.tokens(col("text")), " ")),
      keyCol = "_norm")
    val pairs = MinHashLsh.nearDuplicates(exact, jaccardThreshold)
    val survivors = exact.join(
      pairs.select(col("id_b").as("id")).distinct(), Seq("id"), "left_anti")
    Stages(profiled, kept, exact, pairs, survivors)
  }

  /** Deterministic per-source-prefix downsampling: keep a row iff
    * lcg(id) mod 2^31 < rate(source) · 2^31, where rate is the first
    * matching prefix in `rates` (check order = Seq order; `defaultRate`
    * otherwise). Purely a function of (id, source) — stable across
    * partitionings, executors, and re-runs, and reproducible in plain SQL —
    * which is what makes sampled corpora auditable. No shuffle: the filter
    * fuses into the scan. */
  def deterministicSample(docs: DataFrame, rates: Seq[(String, Double)],
                          defaultRate: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.Column
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((p, r), acc) =>
      when(col("source").startsWith(p), lit(r)).otherwise(acc)
    }
    docs.filter(lcgBucket(col("id")) < rate * lit(LcgMod))
  }

  /** The engine's shared sampling hash: glibc-constant LCG of the id into
    * [0, 2^31) — partition-invariant, cheap, DuckDB-reproducible. Every
    * deterministic-sampling decision (quota sampling, split flags, mixture
    * fractional epochs, shard shuffle) keys on this so one id always lands
    * on the same side of a rate threshold across operators. */
  val LcgMod = 2147483648L
  def lcgBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id * lit(1103515245L) + lit(12345L)) % lit(LcgMod)

  /** One-row funnel metrics: row counts at every stage plus the near-dup
    * pair count. Two corpus passes, not five: one aggregate over the profile
    * scan folds n_profiled, n_kept (conditional sum) and n_exact (distinct
    * normalized keys among kept rows — exactly the exact-dedup survivor
    * count); the pair stage contributes nd_pairs and the dropped-id count,
    * so n_survivors = n_exact − distinct(id_b) without a third pass. */
  def funnel(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
             minTokens: Int = 10, jaccardThreshold: Double = 0.2): DataFrame = {
    val profiled = profile(docs)
    val keep = col("lang") === lang && col("quality") >= minQuality &&
      col("n_ws") >= minTokens
    val norm = array_join(TextFunctions.tokens(col("text")), " ")
    val head = profiled.agg(
      count(lit(1)).as("n_profiled"),
      // coalesce: sum over an empty relation is NULL, and an empty corpus
      // must report a zero funnel, not a null one
      coalesce(sum(when(keep, 1L).otherwise(0L)), lit(0L)).as("n_kept"),
      countDistinct(when(keep, norm)).as("n_exact"))
    val exact = Dedup.dedupExact(
      profiled.filter(keep).withColumn("_norm", norm), keyCol = "_norm").drop("_norm")
    val tail = MinHashLsh.nearDuplicates(exact, jaccardThreshold).agg(
      count(lit(1)).as("nd_pairs"),
      countDistinct(col("id_b")).as("n_dropped"))
    head.crossJoin(tail).select(
      col("n_profiled"), col("n_kept"), col("n_exact"), col("nd_pairs"),
      (col("n_exact") - col("n_dropped")).as("n_survivors"))
  }

  /** Benchmark decontamination: (id, bench_id, n_shared) for corpus docs
    * sharing at least `minShared` distinct word n-gram shingles with a
    * benchmark doc — the GPT-3-appendix / C4-style n-gram collision test a
    * pre-training run applies against its eval sets before training.
    *
    * Scale shape: the corpus side is scan + explode (no self-join, no
    * quadratic pair space); the benchmark side — eval sets are tiny
    * relative to a 100 TB corpus — broadcasts its exploded shingles, so the
    * collision join is map-side. Both shingle sets are per-doc distinct
    * ([[MinHashLsh.shingleSets]]), so the pair count IS the intersection
    * size. */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
                    minShared: Int = 1): DataFrame = {
    val ds = MinHashLsh.shingleSets(docs, n)
      .select(col("id"), explode(col("sh")).as("h"))
    val bs = MinHashLsh.shingleSets(benchmark, n)
      .select(col("id").as("bench_id"), explode(col("sh")).as("h"))
    ds.join(broadcast(bs), "h")
      .groupBy("id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Email pattern — RE2-safe (no backrefs/lookaround) so the same pattern
    * runs in Spark (java.util.regex) and DuckDB (RE2) identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-format phone: + followed by 7-15 digits. */
  val PhoneRe = "\\+\\d{7,15}"

  /** PII scrub stage: redact emails, IPv4 addresses and +international
    * phone numbers with typed sentinels, and count each redaction —
    * the per-type counts feed the curation funnel's audit trail. Pure
    * column expressions: one codegen pass fused into the scan, no
    * shuffle, no UDF. Order matters: emails first (they contain dots and
    * digits), then IPs, then phones. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("n_email", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ip", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("n_phone", regexp_count(col(textCol), lit(PhoneRe)))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))

  /** Incremental curation: fold a new batch (ids strictly greater than
    * every already-curated id — append-only ingest) into retained state
    * without re-curating the old corpus. Retained state = the old run's
    * [[Stages]]: `exact` (every exact-dedup survivor, INCLUDING rows later
    * dropped as near-dups — new rows must still collide with them) and
    * `survivors`.
    *
    * Equal to a full-batch [[curate]] over old ∪ new (pinned by
    * CurationSpec):
    *  - exact dedup keeps the lowest id per normalized key, so a new row
    *    whose key already exists is dropped and old rows never change;
    *  - near-dup pairs split into old-old (already applied) and ≥1-new
    *    ([[MinHashLsh.nearDuplicatesIncremental]], with bucket sizing over
    *    the full band set); the dropped max-id side is always new.
    *
    * At 100 TB this is the point: each ingest batch costs O(batch) profile
    * work plus one banding join against stored shingle/band state, not a
    * full re-curation. The old `exact` frame is touched only through its
    * retained `_norm` key column and its shingle sets — at scale both live
    * in stored state tables, appended per batch, so nothing re-tokenizes
    * the old corpus.
    *
    * Known boundary caveat: the `maxBucket` skew guard sizes LSH buckets
    * over the merged band set, so a bucket that crosses the bound ONLY
    * after the merge is skipped by a from-scratch recuration while the
    * increment keeps the old run's inside-bucket drops. Such buckets hold
    * ≥ maxBucket copies of one shingle signature (degenerate boilerplate,
    * where the guard deliberately gives up pair generation); inside that
    * regime the two answers may differ by design. */
  def curateIncrement(old: Stages, newDocs: DataFrame, lang: String = "en",
                      minQuality: Double = 0.5, minTokens: Int = 10,
                      jaccardThreshold: Double = 0.2): DataFrame = {
    val profiled = profile(newDocs)
    val kept = profiled.filter(
      col("lang") === lang && col("quality") >= minQuality && col("n_ws") >= minTokens)
    val newExact0 = Dedup.dedupExact(
      kept.withColumn("_norm", array_join(TextFunctions.tokens(col("text")), " ")),
      keyCol = "_norm")
    val newExact = newExact0
      .join(old.exact.select("_norm"), Seq("_norm"), "left_anti")
    val pairs = MinHashLsh.nearDuplicatesIncremental(
      MinHashLsh.shingleSets(old.exact), MinHashLsh.shingleSets(newExact),
      jaccardThreshold)
    old.survivors.unionByName(
      newExact.join(pairs.select(col("id_b").as("id")).distinct(),
        Seq("id"), "left_anti"))
  }

  /** Deterministic train/val split with a near-dup leakage audit: docs are
    * hash-split by the same LCG as [[deterministicSample]] into val
    * (bucket < valFrac) and train; a leakage row is a val doc with a
    * near-duplicate on the train side — the cross-split contamination a
    * random split silently ships (inflates eval scores). Output
    * (val_id, train_id, jaccard), one row per leaking pair.
    *
    * Scale shape: the pair generation is the MinHash-LSH banding join
    * (never the quadratic pair space); the split flags are a projection of
    * the id column joined onto the (small) pair set. */
  def splitLeakage(docs: DataFrame, valFrac: Double = 0.2,
                   jaccardThreshold: Double = 0.2): DataFrame = {
    val flags = docs.select(col("id"),
      (lcgBucket(col("id")) < lit(valFrac) * lit(LcgMod)).as("_v"))
    MinHashLsh.nearDuplicates(docs, jaccardThreshold)
      .join(flags.select(col("id").as("id_a"), col("_v").as("_va")), "id_a")
      .join(flags.select(col("id").as("id_b"), col("_v").as("_vb")), "id_b")
      .filter(col("_va") =!= col("_vb"))
      .select(
        when(col("_va"), col("id_a")).otherwise(col("id_b")).as("val_id"),
        when(col("_va"), col("id_b")).otherwise(col("id_a")).as("train_id"),
        col("jaccard"))
  }

  /** DSIR-style importance resampling scores (Xie et al. '23, "Data
    * Selection for Language Models via Importance Resampling", public
    * method): documents are scored by how much more likely their hashed
    * unigram features are under a target distribution than under the raw
    * corpus. Features are polyHash(token) mod `buckets`; per-bucket
    * log-likelihood-ratio weights use add-alpha smoothing:
    *
    *   w(b) = ln((c_tgt(b)+α)/(T_tgt+αB)) − ln((c_raw(b)+α)/(T_raw+αB))
    *
    * and a document's score is the occurrence-weighted mean of its bucket
    * weights. `kept` flags score ≥ `threshold` (0 = "more target-like than
    * raw") — the deterministic thresholded form of the paper's importance
    * resampling (their Gumbel top-k draw adds randomness this engine's
    * determinism contract excludes).
    *
    * Determinism contract: each bucket weight is rounded to integer
    * micro-units once; per-document sums are integer (order-free); one
    * division at the end (the [[TextAnalysis.unigramNll]] discipline).
    *
    * Scale shape: the occurrence stream collapses to the per-document
    * bucket multiset (id, bucket, cnt) in its first map-side-combined
    * shuffle; the raw and target bucket tables roll up from that frame
    * (≤ B rows each); totals enter as a broadcast 1-row aggregate; the
    * scoring join broadcasts the ≤ B-row weight table — the hashed-feature
    * trick is exactly what makes DSIR run at web scale. `targetPred` is a
    * predicate over the docs columns (e.g. a trusted-source flag). */
  def dsirScores(docs: DataFrame, targetPred: org.apache.spark.sql.Column,
                 buckets: Int = 1024, alpha: Double = 0.5,
                 threshold: Double = 0.0): DataFrame = {
    val occ = docs
      .select(col("id"), targetPred.as("_is_t"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .select(col("id"), col("_is_t"),
        pmod(TextFunctions.polyHash(col("term")), lit(buckets.toLong)).as("bucket"))
      .groupBy("id", "_is_t", "bucket").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds both count rollups and the scoring join
    val raw = occ.groupBy("bucket").agg(sum("cnt").as("c_raw"))
    val tgt = occ.filter(col("_is_t")).groupBy("bucket").agg(sum("cnt").as("c_tgt"))
    val cnts = raw.join(tgt, Seq("bucket"), "left").na.fill(0L, Seq("c_tgt"))
    val tot = cnts.agg(sum("c_raw").as("t_raw"), sum("c_tgt").as("t_tgt"))
    val aB = alpha * buckets
    val wMicro = cnts.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round((log((col("c_tgt") + alpha) / (col("t_tgt") + aB))
          - log((col("c_raw") + alpha) / (col("t_raw") + aB))) * 1e6, 0)
          .cast("long").as("_w"))
    occ.join(broadcast(wMicro), "bucket")
      .groupBy("id")
      .agg(sum("cnt").as("n_tok"), sum(col("_w") * col("cnt")).as("_s"))
      .select(col("id"), col("n_tok"),
        round(col("_s").cast("double") / 1e6 / col("n_tok"), 6).as("dsir_score"))
      .withColumn("kept", col("dsir_score") >= threshold)
  }

  /** Domain-mixture planning: given per-domain token counts and integer
    * target weights, compute the sampling plan that realizes the target
    * mixture inside a token budget — per domain the required token count,
    * the sampling rate (<1 → subsample) and the epoch count (>1 → repeat),
    * i.e. the "data mixture" table a pretraining run is configured from.
    *
    * Scale shape: one groupBy over the corpus (map-side combined), then
    * arithmetic over |domains| rows with the corpus total attached as a
    * broadcast 1-row aggregate — no driver round-trips, no windows.
    *
    * Determinism contract: weights are integer, the budget is
    * floor(total * budgetFrac), and every derived double is computed with
    * the exact same expression shape as the DuckDB oracle.
    *
    * `docs` needs (domainCol, text). Domains missing from `targets` get
    * weight 0 (dropped from the mixture). */
  def mixturePlan(docs: DataFrame, targets: Seq[(String, Long)],
                  budgetFrac: Double = 0.5,
                  domainCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    val sumW = targets.map(_._2).sum.toDouble
    val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
    val perDomain = docs
      .select(col(domainCol).as("domain"), bpe.cast("long").as("_tok"))
      .groupBy("domain").agg(sum("_tok").as("tokens"))
    val total = perDomain.agg(sum("tokens").as("_total"))
    val targetDf = spark.createDataFrame(targets).toDF("domain", "_w")
    perDomain
      .crossJoin(broadcast(total))
      .join(broadcast(targetDf), Seq("domain"), "left")
      .withColumn("_w", coalesce(col("_w"), lit(0L)))
      .withColumn("_budget", floor(col("_total").cast("double") * budgetFrac))
      .withColumn("required_tokens",
        floor(col("_budget").cast("double") * col("_w") / sumW).cast("long"))
      .select(
        col("domain"), col("tokens"),
        round(col("tokens").cast("double") / col("_total"), 6).as("natural_share"),
        round(col("_w").cast("double") / sumW, 6).as("target_share"),
        col("required_tokens"),
        round(col("required_tokens").cast("double") / col("tokens"), 6).as("sample_rate"),
        ceil(col("required_tokens").cast("double") / col("tokens")).cast("int").as("epochs"))
  }

  /** Temperature-flattened sampling mixture at T = 2 (public recipe:
    * exponentiated-share sampling q_d ∝ p_d^(1/T), the multilingual
    * up-sampling rule of XLM-R/mT5; T = 2 makes the exponent exactly 1/2,
    * i.e. q_d ∝ √n_d). Returns per domain the natural share p_d, the
    * flattened share q_d, and the sampling boost q_d/p_d (>1 = up-sample
    * low-resource domain, <1 = down-sample the head).
    *
    * Determinism contract: √n_d is IEEE-correctly-rounded in BOTH engines
    * (sqrt is an exactly-rounded operation, unlike pow — the reason T = 2
    * is the tier implemented), scaled to integer micro-units BEFORE the
    * normalizing sum, so every aggregate is order-free integer math and
    * each output double is one mirrored expression.
    *
    * Scale shape: one map-side-combined groupBy over the corpus, then
    * arithmetic over |domains| rows against a broadcast 1-row total. */
  def temperatureMix(docs: DataFrame, domainCol: String = "lang"): DataFrame = {
    val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
    val perDomain = docs
      .select(col(domainCol).as("domain"), bpe.cast("long").as("_tok"))
      .groupBy("domain").agg(sum("_tok").as("tokens"))
      // a domain whose every document tokenizes to zero tokens has no
      // defined boost (q_d/p_d is 0/0) — exclude it explicitly rather
      // than emitting a null boost row (mirrored in the oracle SQL)
      .filter(col("tokens") > 0)
      .withColumn("_s_micro",
        round(sqrt(col("tokens").cast("double")) * 1e6, 0).cast("long"))
    val tot = perDomain.agg(sum("tokens").as("_total"), sum("_s_micro").as("_s_sum"))
    perDomain.crossJoin(broadcast(tot))
      .select(col("domain"), col("tokens"),
        round(col("tokens").cast("double") / col("_total"), 6).as("natural_share"),
        round(col("_s_micro").cast("double") / col("_s_sum"), 6).as("sampled_share"),
        round(col("_s_micro").cast("double") * col("_total") /
          (col("_s_sum").cast("double") * col("tokens")), 6).as("boost"))
  }

  /** Paragraph-level exact dedup (the C4/MassiveText sub-document form,
    * public method): the corpus keeps ONE occurrence of every distinct
    * normalized paragraph — the first in (id, pos) order — and each
    * document is reconstructed from its surviving paragraphs in original
    * order. Paragraphs are blank-line-separated, trimmed, empties dropped;
    * the dedup key is the whitespace/case-normalized token join, matching
    * [[graft.dedup.Dedup.dedupExact]]'s key. Documents whose every
    * paragraph was claimed elsewhere are absent from the output.
    *
    * Scale shape: one shuffle on the normalized paragraph (a window keyed
    * on it picks the first claimant), one groupBy(id) to reassemble.
    * Paragraph rows carry roughly corpus bytes once — no blowup. */
  def dedupParagraphs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = docs
      .select(col(idCol).as("id"),
        posexplode(filter(
          transform(split(col(textCol), "\n\\s*\n"), p => trim(p)),
          p => length(p) > 0)).as(Seq("pos", "para")))
      .withColumn("_norm", array_join(TextFunctions.tokens(col("para")), " "))
    val w = Window.partitionBy("_norm").orderBy("id", "pos")
    paras
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x.getField("para")), "\n\n").as("text"))
  }

  /** C4's heuristic cleaning rules (Raffel et al. '20 §2.2, public):
    * line-level keeps — a retained line must end in a terminal punctuation
    * mark, contain at least `minWords` words, and not contain a
    * policy/boilerplate phrase ("javascript", "privacy policy", "terms of
    * use", "cookie policy", "uses cookies") — and document-level drops: any
    * page containing "lorem ipsum" or a curly brace, or retaining fewer
    * than `minSentences` lines, is removed entirely. Output one row per
    * surviving document: (id, n_lines, n_kept, text) with `text` rebuilt
    * from the kept lines in original order.
    *
    * Scale shape: pure column math fused into the scan — one pass, no
    * shuffle, no UDF; the line split and per-line predicates are HOFs over
    * the row's own text. The RE2-safe regexes run identically in Spark and
    * DuckDB (same discipline as [[scrubPii]]). */
  def c4Filters(docs: DataFrame, minWords: Int = 3, minSentences: Int = 3,
                textCol: String = "text", idCol: String = "id"): DataFrame =
    c4Flagged(docs, minWords, textCol, idCol)
      .filter(!col("_lorem") && !col("_brace") && size(col("_kept")) >= minSentences)
      .select(col("id"), size(col("_lines")).as("n_lines"),
        size(col("_kept")).as("n_kept"),
        array_join(col("_kept"), "\n").as("text"))

  /** One-row funnel for the C4 stage: exclusive drop accounting (a page
    * counts against the FIRST rule that kills it: lorem → brace → too few
    * kept sentences) plus total/kept line counts — all integer sums, so
    * the DuckDB oracle matches exactly. */
  def c4Funnel(docs: DataFrame, minWords: Int = 3, minSentences: Int = 3,
               textCol: String = "text", idCol: String = "id"): DataFrame =
    c4Flagged(docs, minWords, textCol, idCol)
      .select(col("_lorem"), col("_brace"),
        size(col("_lines")).as("_nl"), size(col("_kept")).as("_nk"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("_lorem"), 1L).otherwise(0L)), lit(0L))
          .as("n_dropped_lorem"),
        coalesce(sum(when(!col("_lorem") && col("_brace"), 1L).otherwise(0L)),
          lit(0L)).as("n_dropped_brace"),
        coalesce(sum(when(!col("_lorem") && !col("_brace") &&
          col("_nk") < minSentences, 1L).otherwise(0L)), lit(0L))
          .as("n_dropped_short"),
        coalesce(sum(when(!col("_lorem") && !col("_brace") &&
          col("_nk") >= minSentences, 1L).otherwise(0L)), lit(0L))
          .as("n_survivors"),
        coalesce(sum(col("_nl").cast("long")), lit(0L)).as("n_lines_total"),
        coalesce(sum(col("_nk").cast("long")), lit(0L)).as("n_kept_total"))

  /** RE2-safe phrase list for C4's line-level boilerplate rule. */
  val C4PolicyRe = "(javascript|privacy policy|terms of use|cookie policy|uses cookies)"
  /** Terminal punctuation (C4 keeps lines ending in . ! ? or a quote). */
  val C4TerminalRe = "[.!?\"]$"

  private def c4Flagged(docs: DataFrame, minWords: Int,
                        textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    val keepLine = (l: Column) =>
      l.rlike(C4TerminalRe) &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords &&
        !lower(l).rlike(C4PolicyRe)
    docs
      .select(col(idCol).as("id"), col(textCol).as("_raw"))
      .withColumn("_lines",
        filter(transform(split(col("_raw"), "\n"), l => trim(l)),
          l => length(l) > 0))
      .withColumn("_kept", filter(col("_lines"), keepLine))
      .withColumn("_lorem", lower(col("_raw")).contains("lorem ipsum"))
      .withColumn("_brace", col("_raw").contains("{"))
  }

  /** MATERIALIZE a [[mixturePlan]]: one output row per (doc, copy). A
    * domain with sample_rate r contributes floor(r) full epochs of every
    * doc plus a fractional epoch sampled by the same partition-invariant
    * LCG as [[deterministicSample]] — so repeats (r > 1, upsampled
    * domains) and subsampling (r < 1) fall out of one rule, rows are
    * deterministic under any partitioning, and the realized token mass per
    * domain converges on the plan's required_tokens. Zero-weight domains
    * (rate 0) vanish. Broadcast plan join + explode: map-only. */
  def mixtureApply(docs: DataFrame, targets: Seq[(String, Long)],
                   budgetFrac: Double = 0.5,
                   domainCol: String = "lang",
                   idCol: String = "id"): DataFrame = {
    val plan = mixturePlan(docs, targets, budgetFrac, domainCol)
      .select(col("domain"), col("sample_rate"))
    val copies = (floor(col("sample_rate")).cast("long") +
      when(lcgBucket(col("id")) <
        (col("sample_rate") - floor(col("sample_rate"))) * lit(LcgMod), 1L)
        .otherwise(0L))
    docs.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .join(broadcast(plan), Seq("domain"))
      .withColumn("_n", copies)
      .filter(col("_n") > 0)
      .select(col("id"), col("domain"),
        explode(sequence(lit(0L), col("_n") - 1)).as("copy"))
  }

  /** Corpus-level boilerplate line removal (Rae et al. '21 MassiveText
    * §A1.2's "repeated boilerplate" notion combined with CCNet's cross-
    * document line hashing, Wenzek '19 §4.1 — both public): a line whose
    * trimmed form appears in ≥ `minDocs` DISTINCT documents is boilerplate
    * (cookie banners, nav menus, footers) and is removed from every
    * document. Returns (id, n_lines, n_boiler, text_clean) with line order
    * preserved.
    *
    * Scale shape: the census and the removal join are keyed by the 8-byte
    * polyHash of the trimmed line — the line STRING is never shuffled
    * (the `exactRepeatedSpans` lesson). A hash collision would fold two
    * distinct lines into one census key on BOTH engines identically (the
    * oracle uses the same hash), and CCNet itself dedups on line hashes.
    * One distinct-(key, doc) aggregation + one count per key + one
    * hash-keyed join back: two shuffles total, no windows, nothing on the
    * driver. */
  def boilerplateLines(docs: DataFrame, minDocs: Int = 10,
                       textCol: String = "text",
                       idCol: String = "id"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")))
      .select(col("id"), col("pos"),
        col("col").as("line"),
        TextFunctions.polyHash(trim(col("col"))).as("_k"),
        (length(trim(col("col"))) > 0).as("_ne"))
    val boiler = lines.filter(col("_ne"))
      .select(col("_k"), col("id")).distinct()
      .groupBy("_k").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_k"), lit(true).as("_boiler"))
    lines.join(boiler, Seq("_k"), "left")
      .withColumn("_b", coalesce(col("_boiler"), lit(false)))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_b"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(transform(array_sort(collect_list(
          when(!col("_b"), struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("text_clean"))
  }

  /** Deterministic weighted sampling without replacement — Efraimidis &
    * Spirakis '06 (public): each row draws u ∈ (0,1) from the partition-
    * invariant LCG and scores key = ln(u)/w; the n LARGEST keys win, which
    * realizes inclusion probability proportional to weight w. The quality
    * score from [[profile]] is the natural weight: higher-quality docs are
    * proportionally likelier to enter the sample, yet every positive-weight
    * doc has a chance — the standard quality-weighted subsample of a
    * curation run (vs the hard threshold of [[curate]]).
    *
    * Zero/negative weights never sample. key is rounded to 6dp before
    * ranking (ties by id) so the DuckDB oracle agrees despite ln ulp
    * differences. Scale shape: map-only scoring fused into the scan +
    * one TakeOrderedAndProject — no shuffle beyond top-n. */
  def weightedSample(weighted: DataFrame, n: Int,
                     weightCol: String = "quality",
                     idCol: String = "id"): DataFrame = {
    val u = (lcgBucket(col(idCol)) + lit(0.5)) / lit(LcgMod.toDouble)
    weighted
      .filter(col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol), 6))
      .orderBy(desc("es_key"), asc(idCol))
      .limit(n)
  }
}
