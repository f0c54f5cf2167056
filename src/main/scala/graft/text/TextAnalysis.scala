package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, and winnowing document fingerprints.
  * All pure column expressions (whole-stage codegen, no UDFs), each with an
  * exact DuckDB-SQL equivalent for the oracle.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language classifier. Deliberately small and hard-coded: the operator
    * contract is the scoring rule, not lexicon quality. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "en"))

  /** Language-ID: per-language stopword hit ratio; argmax, ties broken by
    * profile order; no hits at all → "und" (undetermined). Returns a struct
    * column (lang, score). */
  def langId(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks).cast("double")
    val scores = Profiles.map { case (lang, stops) =>
      val hits = size(filter(toks, t => t.isInCollection(stops)))
      struct(round(hits / n, 6).as("score"), lit(lang).as("lang"))
    }
    // argmax with deterministic ties: sort_array desc orders by (score, lang
    // desc); iterate profiles in order and pick the first with max score
    val best = sort_array(array(scores: _*), asc = false).getItem(0)
    val firstMax = Profiles.foldRight(lit("und")) { case ((lang, stops), acc) =>
      val hits = size(filter(toks, t => t.isInCollection(stops)))
      when(round(hits / n, 6) === best.getField("score") && hits > 0, lit(lang)).otherwise(acc)
    }
    struct(
      when(best.getField("score") > 0, firstMax).otherwise(lit("und")).as("lang"),
      when(n > 0, best.getField("score")).otherwise(lit(0.0)).as("score"))
  }

  /** Token counts: whitespace tokens and BPE-ish word-piece matches
    * (letter runs / digit runs / single non-space symbols). */
  def tokenCounts(text: Column): (Column, Column) = {
    val ws = size(TextFunctions.tokens(text))
    val bpe = size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
    (ws, bpe)
  }

  /** Quality score in [0,1]: length saturation, stopword ratio, vocabulary
    * diversity, non-digit ratio — the classic cheap pre-filter stack for
    * web-scale corpora (C4/Gopher-style rules, simplified). */
  /** The four rule-quality components over a token-count divisor `den`
    * (length saturation, en-stopword ratio, unique-token ratio, digit
    * ratio). Shared by [[qualityScore]] (den = raw n behind an n===0
    * guard) and [[QualityModel]]'s feature assembly (den = greatest(n,1))
    * so the two can never drift apart. */
  def qualityComponents(text: Column, den: Column): (Column, Column, Column, Column) = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks).cast("double")
    val enStops = Profiles.head._2
    val stopRatio = size(filter(toks, t => t.isInCollection(enStops))) / den
    val uniqueRatio = size(array_distinct(toks)) / den
    val digitRatio = (length(regexp_replace(text, "[^0-9]", "")).cast("double")
      / greatest(length(text).cast("double"), lit(1.0)))
    val lengthSat = least(n / 100.0, lit(1.0))
    (lengthSat, stopRatio, uniqueRatio, digitRatio)
  }

  def qualityScore(text: Column): Column = {
    val n = size(TextFunctions.tokens(text)).cast("double")
    val (lengthSat, stopRatio, uniqueRatio, digitRatio) = qualityComponents(text, n)
    when(n === 0, 0.0).otherwise(round(
      lengthSat * 0.3 + stopRatio * 0.2 + uniqueRatio * 0.3 + (lit(1.0) - digitRatio) * 0.2, 6))
  }

  /** Gopher-style repetition signals (Rae et al. '21 §A1.1, public):
    * per-document duplicate-line fraction and top-bigram token coverage —
    * the standard repetition filters applied after [[qualityScore]] in a
    * web-scale curation run.
    *
    *   dup_line_frac   = 1 − |distinct non-empty lines| / |non-empty lines|
    *                     (pure HOF column math, fused into the scan)
    *   top_bigram_frac = 2 · max bigram count / |tokens|
    *                     (explode → count per (doc, bigram) → max per doc:
    *                     one shuffle on (id, bigram) with map-side partial
    *                     aggregation — the same shape as term frequencies)
    *
    * Docs with < 2 tokens have top_bigram_frac 0; docs with no non-empty
    * lines have dup_line_frac 0. Output: (id, dup_line_frac,
    * top_bigram_frac), both rounded 6dp. */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "id"): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("double")
    val dupLineFrac = when(nLines > 0,
      round(lit(1.0) - size(array_distinct(lines)) / nLines, 6)).otherwise(0.0)
    val base = docs.select(col(idCol).as("id"), col(textCol).as("_t"),
      dupLineFrac.as("dup_line_frac"))
    val toks = TextFunctions.tokens(col("_t"))
    val bigrams = base
      .select(col("id"), size(toks).cast("double").as("_n"),
        explode(TextFunctions.shingles(col("_t"), 2)).as("_bg"))
      .groupBy("id", "_n", "_bg").agg(count(lit(1)).as("_cnt"))
      .groupBy("id", "_n").agg(max("_cnt").as("_top"))
      .select(col("id"),
        round(lit(2.0) * col("_top") / col("_n"), 6).as("top_bigram_frac"))
    base.select("id", "dup_line_frac")
      .join(bigrams, Seq("id"), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** Unigram language-model negative log-likelihood per document — the
    * perplexity-style fluency filter of web-scale curation (CCNet trains a
    * KenLM and buckets documents by perplexity; the unigram corpus LM is
    * its simplest deterministic form). p(t) = tf_corpus(t) / total_tokens;
    * nll(doc) = −mean over doc tokens of ln p(t). High nll = rare-token
    * soup; low = stopword-heavy boilerplate — both tails are cut by
    * curation thresholds.
    *
    * Determinism contract: per-term ln p is rounded to 6dp and scaled to
    * integer micro-units BEFORE the per-doc sum, so the aggregation is
    * order-free (exact integer math) and the DuckDB oracle matches
    * bit-for-bit — no float-summation-order hazard.
    *
    * Scale shape: one term-frequency aggregation over the corpus (the same
    * shape as the BM25 stats table, shareable with it), then explode + hash
    * equi-join + integer sum — no broadcast of the vocabulary, no windows.
    * Output: (id, n_tok, nll). */
  def unigramNll(docs: DataFrame, textCol: String = "text",
                 idCol: String = "id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // the tokenize+explode pass feeds both the LM aggregation and the
    // per-doc scoring join — materialize it once (same pattern as
    // MinHashLsh.nearDuplicates' shingle frame)
    val terms = docs.select(col(idCol).as("id"), explode(toks).as("term"))
      .localCheckpoint(true)
    val termStats = terms.groupBy("term").agg(count(lit(1)).as("tf"))
    val total = termStats.agg(sum("tf").as("_total"))
    val lnpMicro = termStats.crossJoin(broadcast(total))
      .select(col("term"),
        round(log(col("tf").cast("double") / col("_total")) * 1e6, 0)
          .cast("long").as("_lnp_micro"))
    terms.join(lnpMicro, "term")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum("_lnp_micro").as("_sum_micro"))
      .select(col("id"), col("n_tok"),
        round(-col("_sum_micro").cast("double") / 1e6 / col("n_tok"), 6).as("nll"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. '19 §4.3, public):
    * rank documents by LM score and split the corpus into head / middle /
    * tail thirds — the data-quality tiers LLaMA-style pipelines sample
    * from. The LM here is [[unigramNll]] (the same order-0 stand-in the
    * other CCNet-shaped filters use); `head` = LOWEST nll (most fluent),
    * ties at a threshold go to the better bucket.
    *
    * Scale shape — no global sort, no per-doc window: nll is quantized to
    * a 1e-4 integer grid (per-token ln-prob magnitudes are bounded — nll
    * stays under a few tens of units — so the histogram is ≤ a few
    * hundred thousand rows at ANY corpus size, vs one row per doc for an
    * exact split), the two nearest-rank tercile thresholds come from a
    * cumulative count over that bounded histogram, and each doc is
    * labeled map-side against the two broadcast scalars. Rank arithmetic
    * is pure-integer ceildiv ((n + 2) div 3 — positive operands, so
    * Spark's truncating `div` and DuckDB's flooring `//` agree), the
    * lengthQuantiles discipline. Output: (id, n_tok, nll, bucket). */
  def perplexityBuckets(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = unigramNll(docs, textCol)
      .withColumn("_bin", round(col("nll") * 10000, 0).cast("long"))
      .localCheckpoint(true)
    val n = binned.agg(count(lit(1)).as("n_docs"))
    val cum = binned.groupBy("_bin").agg(count(lit(1)).as("_c"))
      .select(col("_bin"), sum("_c").over(Window.orderBy("_bin")).as("_cum"))
    val cuts = cum.crossJoin(broadcast(n)).agg(
      min(when(col("_cum") >= expr("(n_docs + 2) div 3"), col("_bin"))).as("_t1"),
      min(when(col("_cum") >= expr("(2 * n_docs + 2) div 3"), col("_bin"))).as("_t2"))
    binned.crossJoin(broadcast(cuts))
      .select(col("id"), col("n_tok"), col("nll"),
        when(col("_bin") <= col("_t1"), lit("head"))
          .when(col("_bin") <= col("_t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Bigram-LM fluency score — one smoothing step toward CCNet's 5-gram
    * KenLM filter (Wenzek et al. '19, public method; [[unigramNll]] is the
    * order-0 form). An add-k smoothed bigram model is fit on the corpus and
    * scored over its own documents: P(w_i | w_{i-1}) = (c(bigram) + k) /
    * (c(context) + k·V). Gibberish and boilerplate land in the distribution
    * tails exactly as with the real KenLM stage; only the model order
    * differs (the 5-gram model needs external training text this
    * environment doesn't ship).
    *
    * Same exactness discipline as [[unigramNll]]: each distinct bigram's
    * log-probability is rounded to integer micro-units once, per-document
    * sums are integer (order-free), one division at the end.
    *
    * Shape: the occurrence stream collapses to the per-document bigram
    * MULTISET `(id, bg, cnt)` in its very first shuffle (map-side combined
    * groupBy) and every later pass — global counts, context rollup, the
    * scoring join — works on that far smaller frame, so no per-occurrence
    * row ever crosses a second shuffle and the Zipf head ("of the"-class
    * keys) is flattened by the id dimension in the grouping key. The
    * residual scoring-join skew (one row per document containing a head
    * bigram) is AQE skew-join territory, not a per-occurrence hot spot.
    * An 8-byte polyHash join key was considered and rejected: the hash is
    * mod 1e9+7, so corpus-scale bigram vocabularies collide (birthday
    * bound ~3e4 keys) and a collision here corrupts the score — unlike
    * [[exactRepeatedSpans]], which only ever uses hashes as a prefilter
    * ahead of a verbatim verify.
    * Docs with fewer than 2 tokens have no bigrams and are absent. */
  def bigramNll(docs: DataFrame, k: Double = 0.1, textCol: String = "text",
                idCol: String = "id"): DataFrame = {
    val docBg = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true) // feeds the LM aggregation and the scoring join
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .agg(count_distinct(col("term")).as("_v"))
    val bgStats = docBg.groupBy("bg").agg(sum("_cnt").as("_cbg"))
      .localCheckpoint(true) // feeds the context rollup and the lnp join
    // context counts roll up from the DISTINCT-bigram stats (sum of counts
    // by first token), not from raw occurrences — far fewer rows
    val ctxStats = bgStats
      .select(split(col("bg"), " ").getItem(0).as("_ctx"), col("_cbg"))
      .groupBy("_ctx").agg(sum("_cbg").as("_cctx"))
    val lnpMicro = bgStats
      .withColumn("_ctx", split(col("bg"), " ").getItem(0))
      .join(ctxStats, "_ctx")
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        round(log((col("_cbg") + lit(k)) / (col("_cctx") + lit(k) * col("_v"))) * 1e6, 0)
          .cast("long").as("_lnp_micro"))
    docBg.join(lnpMicro, "bg")
      .groupBy("id")
      .agg(sum("_cnt").as("n_bigrams"),
        sum(col("_lnp_micro") * col("_cnt")).as("_s"))
      .select(col("id"), col("n_bigrams"),
        round(-col("_s").cast("double") / 1e6 / col("n_bigrams"), 6).as("nll"))
  }

  /** Interpolated Kneser-Ney bigram LM trained on a corpus slice, scoring
    * every document — the real shape of the CCNet/KenLM perplexity filter
    * (public: Kneser & Ney '95; Chen & Goodman '98 §2.7, whose
    * interpolated form and D = 0.75 discount this implements; CCNet,
    * Wenzek et al. '19, uses exactly such an LM trained on a reference
    * domain to tier web text). Distinct from [[bigramNll]] (add-k, trained
    * on the full corpus): KN discounts observed bigrams by an absolute D
    * and backs off to the CONTINUATION probability — how many contexts a
    * word completes, not how often it occurs — which is what makes
    * high-frequency-but-context-bound words ("Francisco") cheap only
    * after their context.
    *
    *   P(w|u) = (max(c(uw)−D, 0) + D·N1+(u·)·Pc(w)) / c(u·)   if u seen
    *          = Pc(w)                                          otherwise
    *   Pc(w)  = (N1+(·w) + 1) / (T + V + 1)
    *
    * where N1+(u·)/N1+(·w) are distinct continuation/context type counts,
    * T = bigram types, V = train vocab. The +1/+V+1 floor on Pc is
    * add-one over the continuation types — the standard open-vocabulary
    * escape so unseen words score finitely (documented deviation from the
    * closed-vocab textbook form).
    *
    * Determinism contract: every count is an exact integer; P is ONE
    * fixed arithmetic expression over those integers (mirrored
    * token-for-token in the oracle), ln·1e6 is rounded to integer micro
    * BEFORE the per-doc weighted sum, so accumulation is order-free.
    *
    * Scale shape: stats tables are type-counted (bigram-type sized, far
    * smaller than occurrences); the score join runs on DISTINCT bigrams;
    * totals enter as a broadcast 1-row frame. Train slice docs score low
    * (in-domain), off-slice docs high — the CCNet tiering signal.
    * Output: (id, n_bigrams, nll) for every doc with ≥ 2 tokens. */
  def knBigramNll(docs: DataFrame, trainPred: Column, discount: Double = 0.75,
                  textCol: String = "text", idCol: String = "id"): DataFrame = {
    val docBg = docs
      .select(col(idCol).as("id"), trainPred.as("_train"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .groupBy("id", "_train", "bg").agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true) // feeds the LM aggregations and the score join
    val bgStats = docBg.filter(col("_train"))
      .groupBy("bg").agg(sum("_cnt").as("_cbg"))
      .localCheckpoint(true) // feeds ctx, cont, T, and the lnp join
    val ctxStats = bgStats
      .select(split(col("bg"), " ").getItem(0).as("_u"), col("_cbg"))
      .groupBy("_u").agg(sum("_cbg").as("_cctx"), count(lit(1)).as("_n1ctx"))
    val contStats = bgStats
      .select(split(col("bg"), " ").getItem(1).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_cont"))
    val totals = bgStats.agg(count(lit(1)).as("_tt")).crossJoin(
      docs.filter(trainPred)
        .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
        .agg(count_distinct(col("term")).as("_v")))
    val pc = (coalesce(col("_cont"), lit(0L)) + lit(1.0)) /
      (col("_tt") + col("_v") + lit(1.0))
    val lnp = docBg.select("bg").distinct()
      .withColumn("_u", split(col("bg"), " ").getItem(0))
      .withColumn("_w", split(col("bg"), " ").getItem(1))
      .join(bgStats, Seq("bg"), "left")
      .join(ctxStats, Seq("_u"), "left")
      .join(contStats, Seq("_w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_p", when(col("_cctx").isNotNull,
          (greatest(coalesce(col("_cbg"), lit(0L)) - lit(discount), lit(0.0))
            + lit(discount) * col("_n1ctx") * pc) / col("_cctx"))
        .otherwise(pc))
      .select(col("bg"), round(log(col("_p")) * 1e6, 0).cast("long").as("_lnp_micro"))
    docBg.join(lnp, "bg")
      .groupBy("id")
      .agg(sum("_cnt").as("n_bigrams"),
        sum(col("_lnp_micro") * col("_cnt")).as("_s"))
      .select(col("id"), col("n_bigrams"),
        round(-col("_s").cast("double") / 1e6 / col("n_bigrams"), 6).as("nll"))
  }

  /** Trending terms per day: for each calendar day, the terms whose
    * per-day share most exceeds their corpus share —
    * lift = (n/dayTotal)/(cn/corpusTotal) — the temporal drift monitor a
    * continuously-ingesting corpus runs (a spiking term is the first
    * sign of a scraper loop, an event burst, or a contamination wave;
    * same burst-detection lineage as Kleinberg '02, in ratio form).
    * `minCount` floors one-off noise; lift is computed as ONE mirrored
    * integer-product division (n·corpusTotal / (dayTotal·cn), all BIGINT
    * products, 6dp-rounded) so ranking is deterministic; ties by term.
    * Overflow bound: both products are ≤ corpusTotal², so the BIGINT form
    * is exact while the corpus holds < 2^31.5 ≈ 3.0e9 tokens; past that,
    * ANSI arithmetic raises (fail-loud, never silently wrong) and the
    * lift must be rephrased as two double divisions
    * (n/dayTotal)·(corpusTotal/cn) — kept integer here because the 6dp
    * hash oracle mirrors the product form bit-for-bit.
    *
    * Scale shape: occurrences collapse to (day, term) stats in their
    * first map-side-combined shuffle; day totals and corpus term totals
    * roll up from those stats (occurrences never re-shuffle); the rank
    * window partitions by day over the stats — never the raw stream.
    * Output: (day, rank ≤ k, term, n, lift). */
  def trendingTerms(docs: DataFrame, k: Int = 3, minCount: Long = 2,
                    textCol: String = "text",
                    tsCol: String = "created_at"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayTerm = docs
      .select(date_trunc("DAY", col(tsCol)).cast("date").as("day"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("day", "term").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds day totals, corpus totals, and ranking
    val dayTot = dayTerm.groupBy("day").agg(sum("n").as("_dn"))
    val corpTerm = dayTerm.groupBy("term").agg(sum("n").as("_cn"))
    val corpTot = dayTerm.agg(sum("n").as("_ct"))
    val w = Window.partitionBy("day").orderBy(desc("lift"), asc("term"))
    dayTerm.filter(col("n") >= minCount)
      .join(dayTot, "day")
      .join(corpTerm, "term")
      .crossJoin(broadcast(corpTot))
      .withColumn("lift",
        round((col("n") * col("_ct")).cast("double") / (col("_dn") * col("_cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("day"), col("rank").cast("int").as("rank"),
        col("term"), col("n"), col("lift"))
  }

  /** TF-IDF keyword extraction: the top-k terms of each document by
    * tf · ln(N/df) — the classic per-document salient-term summary (the
    * same statistics table BM25 scores from, read document-side instead of
    * query-side). df ≥ 1 for every term that is scored (it occurs in at
    * least its own document), so the raw idf needs no smoothing.
    *
    * Determinism contract: the score is rounded to 6dp BEFORE ranking and
    * ties break on the term string, so the emitted top-k is unique.
    *
    * Scale shape: the occurrence stream collapses to (id, term, tf) in its
    * first map-side-combined shuffle; df rolls up from those distinct
    * stats (occurrences are never re-shuffled); N enters as a broadcast
    * 1-row aggregate; the ranking window partitions by document id — no
    * global window anywhere. Output: (id, kw_rank, term, tf, score). */
  def tfidfKeywords(docs: DataFrame, k: Int = 3, textCol: String = "text",
                    idCol: String = "id"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // feeds the df rollup and the scoring join
    val df = tf.groupBy("term").agg(count(lit(1)).as("_df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), asc("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf").cast("double")
          * log(col("_n").cast("double") / col("_df")), 6).as("score"))
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select("id", "kw_rank", "term", "tf", "score")
  }

  /** Positioned winnowing selection: (id, pos, fp) — one row per selected
    * shingle with its 0-based position, rightmost-minimum tie rule
    * (Schleimer et al. '03 §3's robust winnowing convention). Documents
    * with fewer than `w` shingles contribute nothing (no full window —
    * same restriction the fp_winnowing oracle applies). The substrate for
    * span-level dedup: position p covers tokens [p, p+k). */
  def winnowedPositions(docs: DataFrame, k: Int = 3, w: Int = 4,
                        textCol: String = "text", idCol: String = "id"): DataFrame = {
    val h = TextFunctions.shingleHashes(col(textCol), k)
    val posArr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WinnowPositions(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_h")), w))
    docs
      .select(col(idCol).as("id"), h.as("_h"))
      .filter(size(col("_h")) >= w)
      .select(col("id"), col("_h"), explode(posArr).as("pos"))
      .select(col("id"), col("pos"),
        element_at(col("_h"), (col("pos") + 1).cast("int")).as("fp"))
  }

  /** The declarative O(n·w) HOF formulation of [[winnowedPositions]] — the
    * oracle-shaped reference the codegen kernel is pinned to
    * (KernelEquivalenceSpec). */
  def winnowedPositionsHof(docs: DataFrame, k: Int = 3, w: Int = 4,
                           textCol: String = "text", idCol: String = "id"): DataFrame = {
    val h = TextFunctions.shingleHashes(col(textCol), k)
    docs
      .select(col(idCol).as("id"), h.as("_h"))
      .filter(size(col("_h")) >= w)
      .select(col("id"), col("_h"), explode(array_distinct(
        transform(sequence(lit(0), size(col("_h")) - w),
          j => {
            val minv = array_min(slice(col("_h"), j + 1, lit(w)))
            // rightmost position of the window minimum
            array_max(filter(sequence(j, j + lit(w) - 1),
              p => element_at(col("_h"), p + 1) === minv))
          }))).as("pos"))
      .select(col("id"), col("pos").cast("long").as("pos"),
        element_at(col("_h"), col("pos") + 1).as("fp"))
  }

  /** Span-level repeated-passage detection (the document-internal form of
    * Lee et al. '21's substring dedup, approximated on winnowing-selected
    * shingles): positions whose fingerprint occurs in ≥ `minDocs` distinct
    * documents are merged into maximal token intervals [start, start+…),
    * overlap or adjacency fusing them. Output one row per document with at
    * least one shared span: (id, n_spans, dup_tokens) — all integer math,
    * so the DuckDB oracle matches exactly.
    *
    * Scale shape: fingerprint sharing is one groupBy on fp (map-side
    * combined); the island merge windows are partitioned BY DOCUMENT, so
    * no global ordering exists anywhere. */
  def repeatedSpans(docs: DataFrame, k: Int = 3, w: Int = 4,
                    minDocs: Int = 2): DataFrame = {
    // the per-window argmin is the operator's most expensive pass and
    // feeds both the sharing aggregate and the semi-join — run it once
    val fps = winnowedPositions(docs, k, w).localCheckpoint(true)
    val shared = fps.groupBy("fp")
      .agg(count_distinct(col("id")).as("_nd"))
      .filter(col("_nd") >= minDocs).select("fp")
    val hits = fps.join(shared, Seq("fp"), "left_semi").select("id", "pos")
    mergeIslands(hits, k)
  }

  /** EXACT cross-document substring dedup at fixed granularity (the
    * distributed form of Lee et al. '21's ExactSubstr: their single-node
    * suffix array finds repeats of >= L tokens; here a token span is
    * duplicated iff one of its `g`-token grams occurs VERBATIM in >=
    * `minDocs` distinct documents — every repeat of length >= 2g-1
    * contains a complete repeated g-gram, so g plays L/2). Unlike
    * [[repeatedSpans]] this is not an approximation: grams are grouped by
    * their actual token text, so there is no fingerprint-collision or
    * winnowing-selection slack in either direction.
    *
    * Scale shape: two passes. Candidate generation explodes n (id, pos,
    * hash) rows per n-token document — 8-byte hashes, not g-token strings —
    * and shuffles once with map-side partial aggregation; only CANDIDATE
    * positions (hash shared across >= minDocs docs) pay the verbatim-string
    * extraction and second, much smaller, exact grouping. No global order,
    * no driver-side state, no suffix array.
    *
    * Output matches [[repeatedSpans]]: (id, n_spans, dup_tokens), one row
    * per document with at least one duplicated span. */
  def exactRepeatedSpans(docs: DataFrame, g: Int = 8, minDocs: Int = 2,
                         textCol: String = "text", idCol: String = "id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // pass 1 — candidate generation on 8-BYTE shingle hashes (the codegen
    // kernel hashes each g-gram in place): the wide shuffle carries
    // (id, pos, hash) rows, never the g-token strings — a ~g× byte cut on
    // the operator's dominant cost at corpus scale
    val hashed = docs
      .select(col(idCol).as("id"),
        TextFunctions.shingleHashes(col(textCol), g).as("_h"))
      .filter(size(col("_h")) > 0)
      .select(col("id"), posexplode(col("_h")).as(Seq("pos", "gh")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("gh"))
      .localCheckpoint(true) // feeds the hot-hash agg and the semi-join
    val hot = hashed.groupBy("gh").agg(count_distinct(col("id")).as("_nd"))
      .filter(col("_nd") >= minDocs).select("gh")
    val cand = hashed.join(hot, Seq("gh"), "left_semi").select("id", "pos")
    // pass 2 — exact verify: re-extract the ACTUAL token strings for the
    // (typically tiny) candidate set and group verbatim. A hash collision
    // can only ever ADD a candidate that this grouping then rejects, and a
    // true repeat always reaches it (same gram ⇒ same hash) — zero slack
    // in either direction. AQE broadcasts the candidate set when small, so
    // the token re-extraction join is usually map-only.
    val candGrams = cand
      .join(docs.select(col(idCol).as("id"), toks.as("_t")), Seq("id"))
      .select(col("id"), col("pos"),
        array_join(slice(col("_t"), (col("pos") + 1).cast("int"), lit(g)), " ")
          .as("gram"))
      .localCheckpoint(true) // feeds the sharing agg and the hit semi-join
    val shared = candGrams.groupBy("gram")
      .agg(count_distinct(col("id")).as("_nd"))
      .filter(col("_nd") >= minDocs).select("gram")
    val hits = candGrams.join(shared, Seq("gram"), "left_semi").select("id", "pos")
    mergeIslands(hits, g)
  }

  /** Merge hit positions (each covering tokens [pos, pos+width)) into
    * maximal overlapping-or-adjacent islands, per document: (id, n_spans,
    * dup_tokens). Windows are partitioned BY DOCUMENT — no global order. */
  private def mergeIslands(hits: DataFrame, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevMaxEnd = max(col("pos") + width).over(before)
    hits
      .withColumn("_new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("_island", sum("_new").over(upTo))
      .groupBy("id", "_island")
      .agg(min("pos").as("_s"), max(col("pos") + width).as("_e"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"), sum(col("_e") - col("_s")).as("dup_tokens"))
  }

  /** Winnowing fingerprint (Schleimer et al. '03): k-gram shingle hashes,
    * sliding window of `w`, keep each window's minimum, distinct. Returns an
    * array<long> column of selected hashes. Backed by the O(n) codegen
    * [[graft.expressions.WinnowSelect]] deque kernel; the declarative HOF
    * form below stays as the semantic pin (KernelEquivalenceSpec). */
  def winnowingFingerprint(text: Column, k: Int = 3, w: Int = 4): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WinnowSelect(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          TextFunctions.shingleHashes(text, k)), w))

  /** The declarative O(n·w) HOF formulation of [[winnowingFingerprint]] —
    * the oracle-shaped reference the codegen kernel is pinned to. */
  def winnowingFingerprintHof(text: Column, k: Int = 3, w: Int = 4): Column = {
    val hashes = TextFunctions.shingleHashes(text, k)
    val m = size(hashes) - (w - 1)
    when(m > 0,
      array_distinct(transform(sequence(lit(1), m),
        i => array_min(slice(hashes, i, lit(w))))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<long>")))
  }

  /** Nearest-rank length quantiles for the corpus card: the value at
    * 1-based rank ceil(pct·n/100) over both character and whitespace-token
    * lengths, pct in {50, 90, 99}. Histogram-first: the only ordered pass
    * runs over the distinct-length histogram (bounded by max document
    * length, not corpus size), so the plan is one map-side-combined
    * groupBy per axis plus a tiny single-partition cumsum — never a global
    * sort of the corpus. Ranks are computed in pure integer arithmetic —
    * ceildiv as (p·n + 99) div 100, positive operands only, where
    * truncating (Spark `div`) and flooring (DuckDB `//`) division agree —
    * so every output is an exact integer and the oracle comparison is
    * float-free. Output one row:
    * (n_docs, p50_chars, p90_chars, p99_chars, p50_ws, p90_ws, p99_ws). */
  def lengthQuantiles(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pcts = Seq(50, 90, 99)
    // one corpus scan feeds both length axes
    val lens = docs
      .select(length(col(textCol)).cast("long").as("vc"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("vw"))
      .localCheckpoint(true)
    val n = lens.agg(count(lit(1)).as("n_docs"))
    def quantiles(valCol: String, suffix: String): DataFrame = {
      val hist = lens.groupBy(col(valCol).as("v")).agg(count(lit(1)).as("c"))
      val cum = hist
        .select(col("v"), sum("c").over(Window.orderBy("v")).as("cum"))
      val qs = pcts.map { p =>
        val rank = expr(s"($p * n_docs + 99) div 100L")
        min(when(col("cum") >= rank, col("v"))).as(s"p${p}_$suffix")
      }
      cum.crossJoin(broadcast(n)).agg(qs.head, qs.tail: _*)
    }
    n.crossJoin(broadcast(quantiles("vc", "chars")))
      .crossJoin(broadcast(quantiles("vw", "ws")))
  }

  /** Zipf rank-frequency fit over the top `topN` corpus terms: the
    * least-squares slope of ln(freq) on ln(rank) with its R² — the
    * corpus-card linguistic sanity stat (natural text slopes ≈ −1;
    * boilerplate-heavy or synthetic corpora flatten or steepen it).
    * Top-N selection is a TakeOrderedAndProject (distributed heap, never a
    * global sort) and the rank window runs over ≤ topN rows. The
    * regression follows the [[unigramNll]] exactness discipline: ln values
    * are rounded to integer micro-units once, all five regression sums are
    * integer (order-free), and the closing slope/R² arithmetic combines a
    * handful of exact BIGINTs in double expressions mirrored token-for-
    * token by the oracle SQL. Output one row: (n_terms, zipf_slope, r2). */
  def zipfSlope(docs: DataFrame, topN: Int = 1000,
                textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(topN)
    val micro = top
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("term"))))
      .select(
        round(log(col("rank").cast("double")) * 1e6, 0).cast("long").as("x"),
        round(log(col("cnt").cast("double")) * 1e6, 0).cast("long").as("y"))
    val (n, sx, sy, sxy, sxx, syy) = (col("n_terms").cast("double"),
      col("_sx").cast("double"), col("_sy").cast("double"),
      col("_sxy").cast("double"), col("_sxx").cast("double"),
      col("_syy").cast("double"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    micro
      .agg(count(lit(1)).as("n_terms"),
        sum("x").as("_sx"), sum("y").as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"),
        sum(col("y") * col("y")).as("_syy"))
      .select(col("n_terms"),
        round(cov / varx, 6).as("zipf_slope"),
        round((cov * cov) / (varx * vary), 6).as("r2"))
  }

  /** Vocabulary-growth (Heaps-law) curve: documents fall into `buckets`
    * equal id-RANGE slices — a map-only assignment, no global rank — and
    * each distinct term is charged to the slice of its first-occurrence
    * doc id. Both axes then accumulate over the ≤ `buckets`-row bucket
    * dimension, so the whole curve costs one term shuffle (min-id per
    * term, map-side combined) plus a tiny cumsum. Output per bucket:
    * (bucket, docs_cum, vocab_cum, new_terms). */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10,
                  textCol: String = "text", idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = docs.agg(min(col(idCol)).as("_lo"), max(col(idCol)).as("_hi"))
    // integral range slice: ((id - lo) * buckets) div (hi - lo + 1)
    def bucketOf(id: Column): Column =
      least(lit(buckets - 1),
        expr(s"(($id - _lo) * $buckets) div (_hi - _lo + 1)")).cast("int")
    val docsPer = docs.select(col(idCol).as("_id"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("_id")).as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val termsPer = docs
      .select(col(idCol).as("_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(min(col("_id")).as("_fid"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("_fid")).as("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsPer.join(termsPer, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .select(col("bucket"),
        sum("n_docs").over(w).as("docs_cum"),
        sum("new_terms").over(w).as("vocab_cum"),
        col("new_terms"))
      .orderBy("bucket")
  }

  /** Flesch reading-ease score (Flesch '48, public) — the classic
    * readability member of the quality-signal family:
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * with the standard cheap approximations: sentences = count of terminal
    * marks [.!?] (min 1), words = whitespace tokens, syllables = vowel
    * GROUPS ([aeiouy]+) per token (min 1 per word happens naturally for
    * vowelless tokens contributing 0 — kept as-is and mirrored exactly in
    * the oracle). Pure codegen column math fused into the scan; the
    * closing expression is token-identical on both engines, rounded 6dp.
    * Zero-token docs are dropped (un-scoreable, like [[langId]]). */
  def readability(docs: DataFrame, textCol: String = "text",
                  idCol: String = "id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val w = size(toks).cast("double")
    val s = greatest(
      length(col(textCol)) - length(regexp_replace(col(textCol), "[.!?]", "")),
      lit(1)).cast("double")
    val syl = aggregate(
      transform(toks, t => size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0)))),
      lit(0), (a, x) => a + x).cast("double")
    docs
      .filter(size(toks) > 0)
      .select(col(idCol).as("id"),
        size(toks).cast("long").as("n_words"),
        s.cast("long").as("n_sentences"),
        syl.cast("long").as("n_syllables"),
        round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (syl / w), 6)
          .as("flesch"))
  }

  /** Duplicate n-gram character coverage — the char-fraction member of the
    * Gopher repetition family (Rae et al. '21 §A1.1 measures "fraction of
    * characters contained in the most frequently-occurring n-gram" for
    * n = 2..4; public). Formulated as max char COVERAGE by any repeated
    * n-gram so the per-doc reduction is an order-free max over integer
    * products (no argmax tie ambiguity between equally frequent grams):
    *
    *   dup_frac(d) = max over n-grams g with count ≥ 2 of
    *                 count(g) · chars(g) / chars(d)      (0 if none)
    *
    * Scale shape: one (id, gram) shuffle with map-side combine — the term-
    * frequency shape — then a per-doc max and a map-only join back; no
    * windows. Output: (id, dup_char_frac) for every doc, 6dp. */
  def dupNgramCharFrac(docs: DataFrame, n: Int = 3,
                       textCol: String = "text",
                       idCol: String = "id"): DataFrame = {
    val cov = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("_g"))
      .groupBy("id", "_g").agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= 2)
      .groupBy("id").agg(max(col("_cnt") * length(col("_g"))).as("_cov"))
    docs.select(col(idCol).as("id"), length(col(textCol)).as("_chars"))
      .join(cov, Seq("id"), "left")
      .select(col("id"),
        when(col("_chars") > 0,
          round(coalesce(col("_cov"), lit(0L)).cast("double") / col("_chars"), 6))
          .otherwise(lit(0.0)).as("dup_char_frac"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks '90,
    * public): the corpus's most associated word pairs —
    *
    *   pmi(a,b) = ln( p(ab) / (p(a)·p(b)) )
    *            = ln( c(ab)·Nu² / (Nb·c(a)·c(b)) )
    *
    * over adjacent-token bigrams, with a minimum pair count (PMI is
    * degenerate on hapax pairs). Output: top-`topK` rows
    * (w1, w2, n_pair, pmi), pmi rounded 6dp, ties by (w1, w2).
    *
    * Scale shape: one (bigram) shuffle and one (token) shuffle, both with
    * map-side combine; the two unigram joins key on the token, the corpus
    * totals enter as broadcast 1-row aggregates; top-k is a
    * TakeOrderedAndProject. The ln argument is a single fixed-shape double
    * expression (no sum of logs), so DuckDB reproduces it exactly. */
  def pmiCollocations(docs: DataFrame, minPair: Int = 5, topK: Int = 20,
                      textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val uniTot = uni.agg(sum("c").cast("long").as("_nu"))
    val bg = docs
      .select(explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val bgTot = docs
      .select(size(TextFunctions.tokens(col(textCol))).as("_n"))
      .agg(sum(greatest(col("_n") - 1, lit(0))).cast("long").as("_nb"))
    bg
      .join(uni.select(col("term").as("w1"), col("c").as("_ca")), "w1")
      .join(uni.select(col("term").as("w2"), col("c").as("_cb")), "w2")
      .crossJoin(uniTot).crossJoin(bgTot)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(
          (col("n_pair").cast("double") * col("_nu") * col("_nu")) /
            (col("_nb").cast("double") * col("_ca") * col("_cb"))), 6).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }

  /** Per-term Jensen-Shannon drift between two corpus slices — the
    * distribution-shift monitor a 100 TB ingest runs between crawls /
    * sources (Lin '91 JS divergence, public). For term t with unigram
    * probabilities p (slice A) and q (slice B):
    *
    *   contrib(t) = ½·p·ln(2p/(p+q)) + ½·q·ln(2q/(p+q))   (0 where c=0)
    *
    * and JS(A,B) = Σ_t contrib(t) ∈ [0, ln 2]. Each term's contribution is
    * rounded to integer NANO-units before any summation, so the corpus
    * total is an order-free BIGINT sum (the micro-unit NLL discipline, one
    * scale finer because contributions are ≪ 1).
    *
    * Returns per-term rows: (term, n_a, n_b, js_nano), the `topK` largest
    * drift contributors (ties by term) — the terms that moved most between
    * the slices. [[jsDivergence]] rolls the SAME frame up to the scalar.
    *
    * Scale shape: one (term) shuffle with map-side combine (the side flag
    * rides as two conditional sums); totals are broadcast 1-row
    * aggregates; map-only scoring. */
  def termDrift(docs: DataFrame, sideA: Column, topK: Int = 20,
                textCol: String = "text"): DataFrame =
    termDriftAll(docs, sideA, textCol)
      .orderBy(desc("js_nano"), asc("term"))
      .limit(topK)

  /** Scalar JS divergence over the same per-term frame: 1 row
    * (n_terms, js) with js = Σ nano / 1e9 rounded 6dp. */
  def jsDivergence(docs: DataFrame, sideA: Column,
                   textCol: String = "text"): DataFrame =
    termDriftAll(docs, sideA, textCol)
      .agg(count(lit(1)).as("n_terms"),
        round(sum("js_nano").cast("double") / 1e9, 6).as("js"))

  /** The STREAMABLE stage of the drift monitor: per-term occurrence counts
    * in each slice — one conditional-sum groupBy, so it runs unchanged as
    * a Structured Streaming complete-mode aggregation (StreamingSpec pins
    * stream ≡ batch); [[termDriftFromCounts]] is then a cheap batch pass
    * over the ≤|vocab|-row counts table per trigger. */
  def termSliceCounts(docs: DataFrame, sideA: Column,
                      textCol: String = "text"): DataFrame =
    docs
      .select(sideA.as("_a"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"))

  private def termDriftAll(docs: DataFrame, sideA: Column,
                           textCol: String): DataFrame =
    termDriftFromCounts(termSliceCounts(docs, sideA, textCol))

  /** Per-term nano-unit JS contributions from a (term, n_a, n_b) counts
    * frame (see [[termDrift]] for the math and determinism contract). */
  def termDriftFromCounts(cnt: DataFrame): DataFrame = {
    // greatest(·, 1) guards an entirely-empty slice (all n_a = 0 → _ta =
    // 0 → p = 0/0 = NaN INSIDE the active n_b branch, since p appears in
    // its mix denominator). With the floor, an empty slice degrades to
    // p = 0 and each term contributes 0.5·q·ln2 — the disjoint-support
    // limit — instead of NaN. No-op for any non-empty slice (total ≥ 1).
    val tot = cnt.agg(
      greatest(sum("n_a").cast("long"), lit(1L)).as("_ta"),
      greatest(sum("n_b").cast("long"), lit(1L)).as("_tb"))
    val p = col("n_a").cast("double") / col("_ta")
    val q = col("n_b").cast("double") / col("_tb")
    val contrib =
      when(col("n_a") > 0,
        lit(0.5) * p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) +
      when(col("n_b") > 0,
        lit(0.5) * q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))
    cnt.crossJoin(tot)
      .select(col("term"), col("n_a"), col("n_b"),
        round(contrib * 1e9, 0).cast("long").as("js_nano"))
  }
}
