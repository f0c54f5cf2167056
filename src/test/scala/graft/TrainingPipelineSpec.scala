package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.{Curation, Packing, TextAnalysis}

/** Invariants for the training-pipeline planning operators: sequence
  * packing (token conservation, exact fill, boundary straddling) and
  * domain-mixture planning (budget realization, epoch semantics). */
class TrainingPipelineSpec extends SparkSpec {

  private lazy val docs =
    Tables.documents(spark, sf()).withColumnRenamed("doc_id", "id")

  test("packSequences conserves tokens and fills every non-final sequence") {
    val seqLen = 512L
    val packed = Packing.packSequences(docs, seqLen.toInt).collect()
    val (_, bpe) = TextAnalysis.tokenCounts(col("text"))
    val total = docs.agg(sum(bpe.cast("long"))).head().getLong(0)
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == total,
      "per-sequence token counts must sum to the corpus token count")
    val ids = packed.map(_.getAs[Long]("seq_id")).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq, "sequence ids contiguous from 0")
    val last = ids.last
    packed.filter(_.getAs[Long]("seq_id") != last).foreach { r =>
      assert(r.getAs[Long]("n_tokens") == seqLen,
        s"sequence ${r.getAs[Long]("seq_id")} not filled to $seqLen")
    }
    // boundary straddling: consecutive sequences share the split document
    // (filter: sliding(2) yields one short window when only one sequence)
    val byId = packed.sortBy(_.getAs[Long]("seq_id"))
    byId.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("first_doc") <= a.getAs[Long]("last_doc") + 1)
    }
  }

  test("packSequences offset phase never runs a global single-partition sort") {
    // audit the pre-checkpoint plan (the checkpoint hides it behind a scan)
    val plan = Packing.tokenOffsets(docs, checkpoint = false)
      .queryExecution.executedPlan.toString
    // the cumsum must be the two-phase form: a range exchange plus
    // per-partition windows — no Window over a SinglePartition exchange
    assert(plan.contains("rangepartitioning"), s"expected range partitioning:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global single-partition step in packing plan:\n$plan")
  }

  test("edge cases: empty corpus, zero-token docs, absent domains, zero vectors") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("id", "text", "lang")
    assert(Packing.packSequences(empty).count() == 0)
    assert(Curation.mixturePlan(empty, Queries.MixtureTargets).count() == 0)
    // zero-token docs take no sequence slots but don't break the offsets
    val sparse = Seq((0L, ""), (1L, "a b c"), (2L, "")).toDF("id", "text")
    val packed = Packing.packSequences(sparse, seqLen = 2).collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == 3L)
    // a target domain absent from the corpus simply yields no row
    val oneLang = Seq(("en", "the quick brown fox")).toDF("lang", "text")
    val plan = Curation.mixturePlan(oneLang, Seq(("en", 1L), ("ja", 9L)))
    assert(plan.select("domain").as[String].collect().toSeq == Seq("en"))
    // an all-zero embedding quantizes to zero code and scores 0, not NaN
    import graft.ann.Quantize
    val zeroVec = Seq((1L, Seq.fill(4)(0.0f)), (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "embedding")
    val scores = Quantize.quantizedScores(zeroVec, Seq(1.0f, 0.0f, 0.0f, 0.0f))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == 0.0 && scores(2L) == 1.0)
  }

  test("repeatedSpans finds the planted shared passage and merges islands") {
    import spark.implicits._
    // distinct vocabularies except one long shared passage inside each text
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val a = s"aa1 aa2 aa3 aa4 $passage aa5 aa6 aa7 aa8 aa9"
    val b = s"bb1 bb2 $passage bb3 bb4 bb5 bb6 bb7 bb8 bb9"
    val c = "cc1 cc2 cc3 cc4 cc5 cc6 cc7 cc8 cc9 cc10 cc11 cc12"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val spans = TextAnalysis.repeatedSpans(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the two passage-carrying docs each report one merged span; the
    // isolated doc reports none
    assert(spans.contains(1L) && spans.contains(2L) && !spans.contains(3L))
    assert(spans(1L)._1 == 1L && spans(2L)._1 == 1L, "one merged island each")
    // the merged span must cover most of the 10-token passage (winnowing
    // selects a subset of shingles, so coverage is approximate from the
    // first to the last selected shared shingle)
    assert(spans(1L)._2 >= 5L && spans(2L)._2 >= 5L)
  }

  test("quality classifier recovers the rule labels on held-out rows") {
    import graft.text.QualityModel
    import org.apache.spark.sql.functions.col
    val labeled = docs.withColumn("label",
      (TextAnalysis.qualityScore(col("text")) >= 0.5).cast("double"))
    val train = labeled.filter(col("id") % 2 === 0)
    val heldOut = labeled.filter(col("id") % 2 === 1)
    val model = QualityModel.train(train)
    val scored = QualityModel.score(model, heldOut)
    val agree = scored
      .filter((col("p_keep") >= 0.5) === (col("label") === 1.0)).count()
    val total = heldOut.count()
    assert(total > 0 && agree.toDouble / total >= 0.9,
      s"classifier agrees on only $agree/$total held-out rows")
    // scoring is a pure map stage: row count preserved, p_keep in [0,1]
    assert(scored.count() == total)
    assert(scored.filter(col("p_keep") < 0 || col("p_keep") > 1).count() == 0)
  }

  test("mixturePlan realizes the target mixture inside the budget") {
    val plan = Curation.mixturePlan(docs, Queries.MixtureTargets)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val total = plan.values.map(_.getAs[Long]("tokens")).sum
    val budget = math.floor(total.toDouble * 0.5).toLong
    val required = plan.values.map(_.getAs[Long]("required_tokens")).sum
    assert(required <= budget, "sum of required tokens must fit the budget")
    // floor-division shortfall is bounded by one token per target domain
    assert(budget - required < Queries.MixtureTargets.size)
    assert(plan("de").getAs[Int]("epochs") >= 2, "de is upsampled (repeat epochs)")
    assert(plan("zh").getAs[Long]("required_tokens") == 0L, "unlisted domain dropped")
    plan.values.foreach { r =>
      val rate = r.getAs[Double]("sample_rate")
      val epochs = r.getAs[Int]("epochs")
      assert(epochs == math.ceil(rate).toInt)
    }
  }

  test("mixtureApply materializes the plan: copy counts honor each domain's rate") {
    val plan = Curation.mixturePlan(docs, Queries.MixtureTargets)
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Double]("sample_rate")).toMap
    val applied = Curation.mixtureApply(docs, Queries.MixtureTargets)
    val perDoc = applied.groupBy("id", "domain")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (_, domain, n) =>
      val rate = plan(domain)
      // every doc gets floor(rate) or floor(rate)+1 copies, never else
      assert(n == math.floor(rate).toLong || n == math.floor(rate).toLong + 1,
        s"$domain rate $rate produced $n copies")
    }
    // zero-weight domains vanish entirely
    assert(!perDoc.exists(_._2 == "zh"))
    // copy indexes are dense 0..n-1 per doc
    val dense = applied.groupBy("id")
      .agg(count(lit(1)).as("n"), min("copy").as("lo"), max("copy").as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count()
    assert(dense == 0)
  }

  test("shuffleShards: positions are a dense permutation per shard, keys decide order") {
    val out = Packing.shuffleShards(docs, nShards = 8)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.nonEmpty && perShard.forall(r =>
      r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1))
    // every doc appears exactly once across shards
    assert(out.count() == docs.count())
    assert(out.select("id").distinct().count() == docs.count())
  }
}
