package graft

import org.apache.spark.sql.functions._
import graft.text.{Curation, TextAnalysis}

/** Training-data curation pipeline: stage semantics and funnel invariants. */
class CurationSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("exact dedup keys on normalized text and keeps the lowest id") {
    val docs = df(
      1L -> "The quick  brown fox jumps over a lazy dog in the park",
      2L -> "the quick brown fox jumps over a lazy dog in the park",
      3L -> "a completely different sentence about the database engine for testing here")
    val st = Curation.curate(docs, minQuality = 0.3)
    assert(st.kept.count() === 3)
    assert(st.exact.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("near-dup stage drops the higher id of each pair") {
    val docs = df(
      1L -> "the quick brown fox jumps over a lazy dog in the green park today",
      2L -> "the quick brown fox jumps over a lazy dog in the green park tonight",
      3L -> "a completely different sentence about the database engine for testing here")
    val st = Curation.curate(docs, minQuality = 0.3, jaccardThreshold = 0.5)
    val pairs = st.pairs.collect()
    assert(pairs.length === 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) === (1L, 2L))
    assert(st.survivors.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("profile filter removes wrong-language and low-quality rows") {
    val docs = df(
      1L -> "the quick brown fox jumps over a lazy dog in the park",
      2L -> "der hund und die katze ist nicht mit ein zu auf haus",
      3L -> "the the the the the the the the the the the")
    val st = Curation.curate(docs, minQuality = 0.5)
    assert(st.profiled.count() === 3)
    assert(st.kept.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("deterministic sampling: rate bounds, prefix resolution, partition invariance") {
    val docs = core.Tables.documents(spark, sf()).withColumnRenamed("doc_id", "id")
    assert(Curation.deterministicSample(docs, Seq(("src", 0.0))).count() === 0)
    assert(Curation.deterministicSample(docs, Seq(("src", 1.0))).count() === docs.count())
    val sampled = Curation.deterministicSample(docs, Seq(("src1", 0.25), ("src", 0.75)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sampled.nonEmpty && sampled.size < docs.count())
    // same rows regardless of physical partitioning — the property that
    // makes the sample reproducible on a cluster
    val resampled = Curation.deterministicSample(docs.repartition(7), Seq(("src1", 0.25), ("src", 0.75)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(resampled === sampled)
  }

  test("empty and fully-filtered corpora produce zero funnels, not nulls or crashes") {
    val empty = df()
    val zeroRow = Curation.funnel(empty).head()
    assert((0 until 5).map(zeroRow.getLong) === Seq(0L, 0L, 0L, 0L, 0L))
    // nothing passes a quality bar of 1.0: pipeline stages are all empty
    val docs = df(1L -> "the quick brown fox jumps over a lazy dog in the park")
    val strict = Curation.funnel(docs, minQuality = 1.0).head()
    assert(strict.getLong(0) === 1L)
    assert((1 until 5).map(strict.getLong) === Seq(0L, 0L, 0L, 0L))
    assert(Curation.curate(docs, minQuality = 1.0).survivors.count() === 0)
  }

  test("scrubPii redacts and counts each PII type independently") {
    val docs = df(
      1L -> "reach me at a.b-c%d@mail-host.co.uk or +12345678901 thanks",
      2L -> "server 192.168.0.1 and 10.0.0.2 are up",
      3L -> "no pii here at all",
      4L -> "x@y.io near 1.2.3.4 call +9999999")
    val out = Curation.scrubPii(docs)
      .select("id", "n_email", "n_ip", "n_phone", "text")
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(2L) == ((0, 2, 0, "server <IP> and <IP> are up")))
    assert(out(3L) == ((0, 0, 0, "no pii here at all")))
    assert(out(4L) == ((1, 1, 1, "<EMAIL> near <IP> call <PHONE>")))
  }

  test("contamination finds planted n-gram overlap and honors minShared") {
    val corpus = df(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven",
      3L -> "alpha beta gamma delta different tail here")
    // bench doc 10 shares a 6-token prefix with corpus 1 and 3
    val bench = df(10L -> "alpha beta gamma delta epsilon zeta other words")
    val hits = Curation.contamination(corpus, bench, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // corpus 1 shares 4 shingles (6-token common prefix), corpus 3 shares 2
    assert(hits((1L, 10L)) == 4L)
    assert(hits((3L, 10L)) == 2L)
    assert(!hits.contains((2L, 10L)))
    // raising minShared drops the weaker hit
    val strict = Curation.contamination(corpus, bench, minShared = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }

  test("repetitionStats computes Gopher line/bigram repetition fractions") {
    val docs = df(
      1L -> "same line\nsame line\nother line", // 3 lines, 2 distinct
      2L -> "go go go go",                      // "go go" bigram count 3, n=4
      3L -> "all distinct words here",
      4L -> "x")                                // <2 tokens: bigram frac 0
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 0.333333) // round(1 - 2/3, 6)
    assert(out(2L) == ((0.0, 1.5)))  // 2*3/4
    assert(out(3L) == ((0.0, 0.5)))  // every bigram unique: 2*1/4
    assert(out(4L) == ((0.0, 0.0)))
  }

  test("dedupParagraphs: first (id, pos) occurrence claims, docs reconstruct in order") {
    val shared = "this repeated paragraph appears in several documents today"
    val docs = df(
      1L -> s"unique opening paragraph one\n\n$shared\n\nunique closing paragraph one",
      2L -> s"$shared\n\nanother unique paragraph two",
      3L -> shared, // every paragraph claimed by doc 1 -> absent
      4L -> s"Standalone   text with odd spacing\n\nstandalone text WITH odd spacing")
    val out = graft.text.Curation.dedupParagraphs(docs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L), out.mkString("; "))
    // doc 1 keeps all three (first claimant of the shared paragraph)
    assert(out(0)._2 == 3 && out(0)._3.contains(shared))
    // doc 2 loses the shared paragraph, keeps its own, order preserved
    assert(out(1)._2 == 1 && out(1)._3 == "another unique paragraph two")
    // normalization is case/whitespace-insensitive: doc 4's two variants
    // are one paragraph; the FIRST spelling survives
    assert(out(2)._2 == 1 && out(2)._3 == "Standalone   text with odd spacing")
  }

  test("bigramNll ranks corpus-typical text as more fluent than one-off text") {
    val typical = "the quick brown fox jumps over the lazy dog"
    val docs = df(((0L to 9L).map(i => i -> typical) :+
      (10L -> "zeta omega kappa lambda sigma epsilon theta delta iota")): _*)
    val out = TextAnalysis.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 11)
    // every bigram of doc 10 occurs once in the corpus; doc 0's bigrams
    // occur 10 times each — the LM must separate them decisively
    assert(out(0L) < out(10L),
      s"typical ${out(0L)} should be more fluent than unique ${out(10L)}")
    // docs with < 2 tokens contribute no bigrams and are absent
    assert(TextAnalysis.bigramNll(df(1L -> "single")).count() == 0)
  }

  test("knBigramNll: hand-checked KN probability, in-domain separation, finite OOV") {
    val s = spark
    import s.implicits._
    // train slice: "a b" ×2 and "a c" ×1 -> c(a·)=3, N1+(a·)=2, T=2
    // vocab {a,b,c} V=3; cont(b)=1, cont(c)=1
    val docs = Seq(
      (0L, "a b", true), (1L, "a b", true), (2L, "a c", true),
      (3L, "a b", false),  // in-domain bigram
      (4L, "a z", false),  // seen context, unseen word
      (5L, "q r", false))  // fully OOV
      .toDF("id", "text", "tr")
    val out = TextAnalysis.knBigramNll(docs, col("tr")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 3 "a b": P = (max(2-.75,0) + .75*2*((1+1)/(2+3+1))) / 3
    val pcB = (1.0 + 1.0) / (2 + 3 + 1.0)
    val pAB = (2.0 - 0.75 + 0.75 * 2 * pcB) / 3.0
    assert(math.abs(out(3L) - (-math.round(math.log(pAB) * 1e6) / 1e6)) < 1e-6)
    // unseen word after a seen context: P = D*N1+(a·)*Pc(z)/c(a·), Pc(z)=1/(T+V+1)
    val pAZ = 0.75 * 2 * (1.0 / (2 + 3 + 1.0)) / 3.0
    assert(math.abs(out(4L) - (-math.round(math.log(pAZ) * 1e6) / 1e6)) < 1e-6)
    // fully OOV bigram: pure continuation floor Pc(r) = 1/(T+V+1) — finite
    val pQR = 1.0 / (2 + 3 + 1.0)
    assert(math.abs(out(5L) - (-math.round(math.log(pQR) * 1e6) / 1e6)) < 1e-6)
    // seen bigrams are always cheapest; note the unseen-word case costs
    // MORE than the unseen-context case here because the a-context's
    // backoff weight λ(a) = D·N1+(a·)/c(a·) = 0.5 scales Pc down, while
    // an unseen context escapes to Pc unscaled — a KN property, not a bug
    assert(out(3L) < out(4L) && out(3L) < out(5L))
    assert(!out.values.exists(_.isNaN))
  }

  test("qualityFluencyCorr: clean-common vs junk-rare corpus correlates strongly negative") {
    val s = spark
    import s.implicits._
    // 10 clean docs share one fluent stopword-rich sentence (high quality,
    // LOW nll — every term is corpus-frequent); 5 junk docs are digit
    // soup with unique rare tokens (low quality, HIGH nll)
    val clean = "the and for you are all can had her was one our out day get"
    val docs = ((1L to 10L).map(i => (i, clean)) ++
      (11L to 15L).map(i => (i, s"99$i 88$i 77$i zq${i}x")))
      .toDF("id", "text")
    val r = graft.text.Curation.qualityFluencyCorr(docs)
      .as[(Long, Double)].head()
    assert(r._1 == 15L)
    assert(r._2 < -0.5, s"expected strong negative quality-nll correlation, got $r")
  }

  test("trendingTerms: a planted one-day burst ranks first with lift > 1; flat terms near 1") {
    val s = spark
    import s.implicits._
    // 'steady' appears twice every day; 'burst' only on day 2, heavily
    val docs = Seq(
      (1L, "steady steady filler", "2024-01-01 01:00:00"),
      (2L, "steady steady filler", "2024-01-02 01:00:00"),
      (3L, "burst burst burst burst", "2024-01-02 02:00:00"),
      (4L, "steady steady filler", "2024-01-03 01:00:00"))
      .toDF("id", "text", "ts")
      .withColumn("created_at", col("ts").cast("timestamp"))
    val out = TextAnalysis.trendingTerms(docs, k = 2).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> (r.getString(2), r.getDouble(4)))
      .toMap
    val (topTerm, topLift) = out(("2024-01-02", 1))
    assert(topTerm == "burst" && topLift > 1.5, s"burst should lead day 2: $out")
    // steady's day-1 share ~= its corpus share -> lift near 1
    val steady1 = out(("2024-01-01", 1))
    assert(steady1._2 < topLift)
    // minCount floors singletons: a day with only unique terms emits nothing
    val sparse = Seq((9L, "one two three", "2024-02-01 00:00:00"))
      .toDF("id", "text", "ts")
      .withColumn("created_at", col("ts").cast("timestamp"))
    assert(TextAnalysis.trendingTerms(sparse).count() == 0)
  }

  test("tfidfKeywords surfaces rare distinctive terms over ubiquitous ones") {
    val docs = df(
      1L -> "common common rare1",
      2L -> "common rare2",
      3L -> "common")
    val byDoc = TextAnalysis.tfidfKeywords(docs, k = 2).collect()
      .groupBy(_.getLong(0))
    // 'common' occurs in every doc → idf ln(1) = 0; the rare term must top
    // doc 1 even though 'common' has the higher tf there
    val top1 = byDoc(1L).minBy(_.getInt(1))
    assert(top1.getString(2) == "rare1")
    assert(byDoc(1L).map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
    for ((_, rows) <- byDoc) {
      val sorted = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
    // doc 3 has only the ubiquitous term: one keyword, score exactly 0
    assert(byDoc(3L).map(_.getString(2)).toSeq == Seq("common"))
    assert(byDoc(3L).head.getDouble(4) == 0.0)
  }

  test("dsirScores separates target-like from raw-like vocabulary") {
    val s2 = spark
    import s2.implicits._
    val docs = (
      (1L to 4L).map(i => (i, "alpha beta gamma delta", "en")) ++
        (11L to 14L).map(i => (i, "uno dos tres cuatro", "es")) :+
        ((21L, "alpha beta gamma delta", "es"))) // target-like text, raw slice
      .toDF("id", "text", "lang")
    val got = Curation.dsirScores(docs, col("lang") === "en",
      buckets = 256, alpha = 0.1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got.size == 9 && got.values.forall(_._1 == 4L))
    // the score is a function of CONTENT, not of slice membership: the
    // es-slice probe with target vocabulary scores exactly like a target doc
    assert(got(21L)._2 == got(1L)._2)
    assert(got(21L)._2 > got(11L)._2,
      s"target-vocab ${got(21L)._2} must outscore raw-vocab ${got(11L)._2}")
    // kept is the thresholded form of the same score
    assert(got.values.forall(v => v._3 == (v._2 >= 0.0)))
  }

  test("lengthQuantiles: nearest-rank values on a hand-computed fixture") {
    // doc i = i repetitions of "x": ws length i, char length 2i-1;
    // n = 10, so rank(p) = ceil(p·10/100) picks ws {5, 9, 10}
    val docs = df((1L to 10L).map(i => i -> ("x " * i.toInt).trim): _*)
    val row = TextAnalysis.lengthQuantiles(docs).head()
    assert(row.getLong(row.fieldIndex("n_docs")) == 10L)
    assert(row.getLong(row.fieldIndex("p50_ws")) == 5L)
    assert(row.getLong(row.fieldIndex("p90_ws")) == 9L)
    assert(row.getLong(row.fieldIndex("p99_ws")) == 10L)
    assert(row.getLong(row.fieldIndex("p50_chars")) == 9L)
    assert(row.getLong(row.fieldIndex("p90_chars")) == 17L)
    assert(row.getLong(row.fieldIndex("p99_chars")) == 19L)
  }

  test("zipfSlope recovers -1 exactly on a constructed power-law corpus") {
    // freq(pos) = 12/pos for pos 1..4 → ln f = ln 12 − ln pos: slope −1, R² 1
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val row = TextAnalysis.zipfSlope(df(1L -> text)).head()
    assert(row.getLong(0) == 4L)
    assert(math.abs(row.getDouble(1) + 1.0) < 1e-4, s"slope ${row.getDouble(1)}")
    assert(row.getDouble(2) > 0.9999, s"r2 ${row.getDouble(2)}")
  }

  test("vocabGrowth charges each term to its first-occurrence slice") {
    // ids 0..3, buckets=2 → range slices {0,1} and {2,3}; "a","b","c"
    // first occur in slice 0 (b via doc 0, not its doc-2 reappearance)
    val docs = df(0L -> "a b", 1L -> "a c", 2L -> "b d", 3L -> "e")
    val got = TextAnalysis.vocabGrowth(docs, buckets = 2, idCol = "id")
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0, 2L, 3L, 3L), (1, 4L, 5L, 2L)), s"got $got")
  }

  test("exactRepeatedSpans finds planted verbatim cross-doc repeats and nothing else") {
    val repeat = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = df(
      1L -> s"unique lead-in words here $repeat and a unique tail for one",
      2L -> s"other opening phrase $repeat closing words differ entirely now",
      3L -> "completely unrelated text with no shared grams at all in it whatsoever",
      4L -> "short")
    val out = TextAnalysis.exactRepeatedSpans(docs, g = 8)
      .orderBy("id").collect()
    // docs 1 and 2 share the 10-token passage; its 3 complete 8-grams merge
    // into one island covering exactly the 10 repeated tokens
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.getLong(1) == 1L && r.getLong(2) == 10L))
  }

  test("winnowing repeatedSpans recall: every exact-duplicated doc is also flagged") {
    // Schleimer '03 guarantee: any verbatim match of >= k + w - 1 = 6 tokens
    // shares a winnowing-selected fingerprint, and tc_exact_spans' g = 8
    // grams are 8-token verbatim matches — so the exact detector's doc set
    // must be a subset of the winnowing detector's at default (k=3, w=4)
    val docs = core.Tables.documents(spark, sf())
      .withColumnRenamed("doc_id", "id").select("id", "text")
    val exact = TextAnalysis.exactRepeatedSpans(docs, g = 8)
      .select("id").distinct()
    val winnowed = TextAnalysis.repeatedSpans(docs)
      .select("id").distinct()
    assert(exact.count() > 0, "fixture corpus should contain verbatim repeats")
    assert(exact.exceptAll(winnowed).count() == 0,
      "exact detector flagged a doc the winnowing approximation missed despite the >= 6-token guarantee")
  }

  test("funnel counts are monotone and consistent on the fixture corpus") {
    val docs = core.Tables.documents(spark, sf()).withColumnRenamed("doc_id", "id")
    val st = Curation.curate(docs)
    val row = Curation.funnel(docs).head()
    val (profiled, kept, exact, ndPairs, survivors) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(profiled > 0 && kept > 0 && survivors > 0)
    assert(kept <= profiled && exact <= kept && survivors <= exact)
    // every dropped near-dup is the higher id of some surviving-pair partner
    val droppedByNd = exact - survivors
    val distinctIdB = st.pairs.select("id_b").distinct().count()
    assert(droppedByNd === distinctIdB)
    assert(ndPairs >= distinctIdB)
  }

  test("incremental curation == full-batch recuration, at several split points") {
    import graft.text.Curation
    val d = graft.core.Tables.documents(spark, sf())
      .withColumnRenamed("doc_id", "id")
    val full = Curation.curate(d).survivors
      .select("id").collect().map(_.getLong(0)).toSet
    for (half <- Seq(50L, 100L, 180L)) {
      val old = Curation.curate(d.filter(org.apache.spark.sql.functions.col("id") < half))
      val inc = Curation.curateIncrement(old, d.filter(org.apache.spark.sql.functions.col("id") >= half))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(inc == full, s"split at $half diverged from full-batch curation")
    }
  }
}
