package graft.ann

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch vector-index builds via MLlib — the cluster-scale alternative to
  * the deterministic label-centroid IVF in [[Ann]] (BASELINE.json
  * north-star: "Batch vector index build via MLlib/DataFrame; online ANN
  * serving not Spark").
  *
  * Both builders are write-time jobs: they produce (row → cell) assignments
  * and centroid tables that get persisted partitioned-by-cell, so query-time
  * probes prune at the file level. Fixed seeds keep runs reproducible for a
  * fixed input partitioning; they are not SQL-oracle-able (MLlib internals),
  * so their correctness gates are invariant specs, not hash compares.
  */
object IndexBuild {

  /** K-means IVF build: returns (assignments with `ivf_cell`, centroids).
    * The trained centers replace [[Ann.centroidsByLabel]]'s fixture
    * centroids; probing reuses [[Ann.ivfTopK]] unchanged. */
  def kmeansIvf(df: DataFrame, nlist: Int, seed: Long = 42L,
                maxIter: Int = 20): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val feat = df.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("ivf_cell")
      .fit(feat)
    val assigned = model.transform(feat).drop("features")
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("label", "centroid")
    (assigned, centroids)
  }

  /** TRAINED centroid table for the production IVF builds (r15 verdict
    * #3 — [[kmeansIvf]] existed, was spec-tested and was wired to
    * NOTHING: the fixture-style label seedings the oracle-gated queries
    * replay — pid-mod-nlist, id-mod-nlist — are SQL-replayable but are
    * not semantic clustering, and the recall ladder shows the cost:
    * `ev_passage_recall` reads 585714 ppm at nprobe 1 on positional
    * cells; the trained seeding measures 725850 ppm on the same corpus
    * and rung at sf0.01 (868027 vs 749660 at nprobe 2, 941497 vs 901361
    * at nprobe 4) — see [[graft.search.Passage.buildIndexTrained]]).
    *
    * Output matches [[Ann.centroidsByLabel]]'s (label, centroid) contract
    * exactly — L2-NORMALIZED centers (spherical-k-means style, MacQueen
    * '67 + Dhillon & Modha '01, public), because everything downstream
    * (probe ordering, [[Ann.assignWithSim]]'s argmax, the drift monitor's
    * csim) scores by dot product: normalizing keeps one centroid's cell
    * from swallowing rows merely because its center vector is longer.
    * Same fixed seed ⇒ reproducible for a fixed input partitioning; not
    * SQL-oracle-able (MLlib internals) — correctness gates are invariant
    * specs (exhaustive-probe ≡ brute, recall ≥ positional on a clustered
    * fixture), the standing kmeans adjudication. */
  /** Cell-count sizing for a trained build — the published Faiss
    * guideline (nlist ≈ 4·√N for IVF; larger nlist = finer pruning but
    * more centroid comparisons and smaller, less-trainable cells), capped
    * by [[Ann.MaxNlist]] (the engine's split/retrain bound), by the row
    * count itself (k-means cannot train more centers than points), and
    * floored at 1. A build-time helper for callers that don't have a
    * tuned nlist: at 10⁶ rows it suggests 4000 cells, at 10⁹ the 4096
    * cap — the ladder ([[graft.eval.RetrievalEval.ivfRecallSweep]])
    * remains the instrument that validates whatever this suggests. */
  def suggestNlist(rows: Long): Int = {
    require(rows >= 0, s"suggestNlist: negative row count $rows")
    math.max(1, Seq(Ann.MaxNlist.toLong, rows,
      math.round(4.0 * math.sqrt(rows.toDouble))).min.toInt)
  }

  def trainedCentroids(embeddings: DataFrame, nlist: Int, seed: Long = 42L,
                       maxIter: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (_, raw) = kmeansIvf(embeddings.select("embedding"), nlist, seed, maxIter)
    raw.as[(Int, Array[Double])]
      .map { case (label, c) =>
        val n = math.sqrt(c.map(x => x * x).sum)
        (label, if (n == 0.0) c else c.map(_ / n))
      }
      .toDF("label", "centroid")
  }

  /** Random-hyperplane LSH near-dup join over the embedding column —
    * MLlib's BucketedRandomProjectionLSH `approxSimilarityJoin`. Returns
    * (id_a, id_b, dist) with id_a < id_b; `maxL2Dist` relates to cosine via
    * d² = 2(1-cos) for unit vectors. */
  def lshNearDuplicates(df: DataFrame, maxL2Dist: Double,
                        numHashTables: Int = 4, bucketLength: Double = 1.0,
                        seed: Long = 42L): DataFrame = {
    // CPU fan-out guard (the Tables.documents lesson): a single-row-group
    // parquet input arrives as ONE split, MLlib's hash-explode join keeps
    // the input's partitioning (both sides broadcast-sized), and the
    // per-pair distance evaluation serializes onto one core — profiled as
    // one 3.7 s single-task stage at sf0.1/local[32]. Redistribute by id
    // once when scan parallelism is far below the cluster's; a real
    // multi-split table takes the `else` branch untouched (the exchange is
    // a no-op guard, not a tuning constant).
    //
    // The split-count probe (`df.rdd.getNumPartitions`) finalizes the
    // adaptive plan, which for a DERIVED input (anything past a shuffle)
    // would EXECUTE its upstream stages once for the probe and again for
    // the real job (r17 ADVICE). A derived input has already been
    // re-partitioned by its shuffle and never needs the fan-out, so the
    // probe is restricted to scan-shaped plans, where .rdd is pure
    // planning.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Sort, Window => LWindow}
    val derived = df.queryExecution.optimizedPlan.find {
      case _: Join | _: Aggregate | _: LWindow | _: RepartitionOperation | _: Sort => true
      case _ => false
    }.isDefined
    val target = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (!derived && df.rdd.getNumPartitions * 4 <= target)
        df.repartition(target, col("id"))
      else df
    val feat = spread.select(col("id"), array_to_vector(col("embedding")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxL2Dist, "dist")
      .select(
        col("datasetA.id").as("ida"), col("datasetB.id").as("idb"),
        round(col("dist"), 6).as("dist"))
      .filter(col("ida") < col("idb"))
      .select(col("ida").as("id_a"), col("idb").as("id_b"), col("dist"))
  }
}
