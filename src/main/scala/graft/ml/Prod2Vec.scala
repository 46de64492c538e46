package graft.ml

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Embedding training + extraction (SURVEY.md §2.6 M1–M4) on MLlib.
  *
  * Reference: the Keras two-tower SGNS variant at
  * `pipeline/model_train/model_train.py:97-126` and weight extraction at
  * `pipeline/post_processing/post_process.py:89-103`. Documented semantic
  * deviation (SURVEY.md N4): MLlib `Word2Vec` trains skip-gram with
  * hierarchical softmax rather than the reference's
  * candidate-sampling softmax — same embedding-quality goal, different
  * objective. The standalone pair/negative operators ([[graft.ops.Pairs]])
  * expose the reference's exact sampling semantics as verifiable
  * dataflow; MLlib subsumes them inside its trainer.
  *
  * Scale posture: `Word2Vec.fit` distributes by partition (setNumPartitions)
  * with driver-side weight averaging per iteration — the standard MLlib
  * trade-off. The extracted embedding table is (vocab × dim) — broadcastable
  * for the similarity joins exactly like the reference's 35k × 1024 matrix
  * (SURVEY.md §4).
  */
object Prod2Vec {

  /** Hyperparameters (mirror of `config/prod2vec_config.yaml:24-39`).
    * `maxSentenceLength` is the trainer-path P7 analog (basket cap,
    * `config/prod2vec_config.yaml:28` `max_basket_length`): MLlib splits
    * longer token sequences into chunks of this size, bounding per-record
    * training cost exactly like [[graft.ops.Pairs.orderedBaskets]]'s
    * truncation bounds pair generation. Default matches MLlib's own
    * (1000), so existing training paths are byte-identical unless a cap
    * is configured. */
  case class Params(
      vectorSize: Int = 16,
      windowSize: Int = 4,      // train_window_size (N1: config wins over README)
      maxIter: Int = 1,         // epochs
      minCount: Int = 2,
      stepSize: Double = 0.025, // learning_rate
      numPartitions: Int = 8,
      seed: Long = 42L,
      maxSentenceLength: Int = 1000)

  /** A1 for the trainer: baskets as string-token sequences (Word2Vec
    * consumes `Array[String]`), tokens in line-number (add-to-cart)
    * order — `collect_list` alone is partitioning-dependent, and a
    * deterministic token order is what makes single-partition seeded
    * training bit-reproducible (the q37 fixture + Prod2VecSpec law). */
  def baskets(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey").as("order_id"))
      .agg(array_sort(collect_list(struct(
          col("l_linenumber").as("n"),
          col("l_partkey").cast("string").as("t"))))
        .getField("t").as("tokens"))

  /** M1: the configured estimator (exposed so specs can assert every
    * [[Params]] field actually reaches MLlib). */
  def estimator(p: Params): Word2Vec =
    new Word2Vec()
      .setInputCol("tokens")
      .setOutputCol("vec")
      .setVectorSize(p.vectorSize)
      .setWindowSize(p.windowSize)
      .setMaxIter(p.maxIter)
      .setMinCount(p.minCount)
      .setStepSize(p.stepSize)
      .setNumPartitions(p.numPartitions)
      .setSeed(p.seed)
      .setMaxSentenceLength(p.maxSentenceLength)

  /** M1+M2: build and fit the embedding model. */
  def train(basketDf: DataFrame, p: Params): Word2VecModel =
    estimator(p).fit(basketDf)

  /** S8: model persistence — the reference's train and post-process stages
    * are separate processes exchanging a saved model
    * (`pipeline/model_train/model_train.py:131` `model.save`;
    * `pipeline/post_processing/post_process.py:89` `load_model`). MLlib's
    * writer persists to a Parquet-backed directory: cluster-readable,
    * version-stamped, no pickling — `path` can be any Hadoop-visible URI,
    * so the 100 TB deployment writes straight to object storage. */
  def save(model: Word2VecModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** S8: load a persisted model — the post-process entry point; see
    * [[save]]. */
  def load(path: String): Word2VecModel = Word2VecModel.load(path)

  /** M4: embedding matrix as a relational table
    * (vec_id = product id, embedding: array<float>) — the
    * `model.get_weights()[0]` → DataFrame step of `post_process.py:92-95`,
    * shaped to slot straight into [[Similarity.cosineTopK]]/[[graft.ops.Ann]]. */
  def embeddings(model: Word2VecModel): DataFrame =
    model.getVectors.select(
      col("word").cast("long").as("vec_id"),
      vector_to_array(col("vector"), "float32").as("embedding"))

  /** M3: top-k similar products per probe — the reference's
    * `SimilarityCallback.run_sim` (`model_train.py:14-49`) expressed
    * relationally over the extracted embedding table (probe excluded from
    * its own neighbors; deterministic tiebreak). Unlike per-word
    * `findSynonyms`, this is one distributed job for ALL probes. */
  def synonyms(model: Word2VecModel, probeIds: Seq[Long], k: Int): DataFrame = {
    val emb = embeddings(model)
    Similarity.cosineTopK(emb, emb.filter(col("vec_id").isin(probeIds: _*)), k)
  }

  /** M5–M7: grid "tuning" — fit each candidate, score it with an
    * intrinsic objective, return the runs table with `iteration` in
    * start order plus the best row. Grid ≠ the reference's SageMaker
    * Bayesian search; [[tuneSearch]] is the sequential model-based
    * (TPE) strategy over the same space that closes that deviation.
    *
    * Objective (minimized): negative mean cosine between the model's
    * embeddings of the `coPairs` (target_pid, neighbor_pid) ground-truth
    * co-purchase pairs — a deterministic, label-free stand-in for the
    * reference's regex-scraped training loss. */
  def tune(basketDf: DataFrame, grid: Seq[Params],
           coPairs: DataFrame): (DataFrame, DataFrame) = {
    val spark = basketDf.sparkSession
    import spark.implicits._
    val runs = grid.zipWithIndex.map { case (p, i) =>
      (s"run_dim${p.vectorSize}_lr${p.stepSize}",
        evalObjective(basketDf, p, coPairs), i.toLong)
    }.toDF("job_name", "objective", "start_ms")
    val table = Similarity.withIteration(runs, "start_ms")
      .withColumn("iteration", col("iteration").cast("long"))
    (table, Similarity.bestRow(table, "objective"))
  }

  /** The tuning objective (minimized): negative mean cosine of the
    * co-purchase ground-truth pairs under the candidate's embeddings —
    * shared by grid [[tune]] and the TPE [[tuneSearch]]. */
  private def evalObjective(basketDf: DataFrame, p: Params,
                            coPairs: DataFrame): Double = {
    val emb = embeddings(train(basketDf, p))
    val a = emb.select(col("vec_id").as("pid_a"),
      transform(col("embedding"), _.cast("double")).as("v_a"))
    val b = emb.select(col("vec_id").as("pid_b"),
      transform(col("embedding"), _.cast("double")).as("v_b"))
    val meanCos = coPairs
      .select(col("target_pid").as("pid_a"), col("neighbor_pid").as("pid_b"))
      .join(a, Seq("pid_a")).join(b, Seq("pid_b"))
      .select(Similarity.cosine(col("v_a"), col("v_b")).as("cos"))
      .agg(avg("cos")).head().getDouble(0)
    -meanCos
  }

  /** M5 without the deviation: sequential model-based search over the
    * SAME candidate space as [[tune]] — the public Tree-structured
    * Parzen Estimator recipe (Bergstra et al., NeurIPS'11, the
    * Hyperopt/SageMaker-class Bayesian strategy the reference's DAG
    * configures at `dags/prod2vec_train_dag.py:156-188`), over an
    * enumerated candidate space:
    *
    * 1. evaluate `initRandom` seeded-random candidates (the warmup
    *    Bayesian search needs before densities mean anything);
    * 2. each further step splits the observed runs at the γ = 25%
    *    objective quantile into good/bad sets, models each as a product
    *    of per-dimension categorical densities with add-one smoothing
    *    (the discrete Parzen estimator), and evaluates the UNSEEN
    *    candidate maximizing l_good(x)/g_bad(x) — expected-improvement
    *    surrogate, exploitation where good runs cluster, smoothing
    *    keeps exploration alive;
    *
    * The CONTINUOUS `stepSize` axis is searched natively: discretize
    * the range with [[logGrid]] (the reference's
    * `learning_rate ∈ [1e-4, 1e-3]` becomes a dense log-spaced axis)
    * and the densities score [[quantileBucket]] membership rather than
    * exact float equality, so evidence from one good rate transfers to
    * its quantile neighbors — the 1-D Parzen window of continuous TPE,
    * realized as equal-count bins. The Prod2VecSpec convergence law
    * drives this against a closed-form objective: with budget ≪ |space|
    * the search concentrates its evaluations in the optimum's bucket.
    * 3. stops at `budget` evaluations (≤ one training per step, the
    *    actual cost unit) and returns the same (runs table, best row)
    *    shape as [[tune]] — iteration = evaluation order.
    *
    * Deterministic: the only randomness is the seeded warmup draw, so a
    * (space, budget, seed) triple replays exactly; with budget ≥ |space|
    * the search is exhaustive and the best row EQUALS grid [[tune]]'s
    * (the Prod2VecSpec law). Driver-paced like every trainer here; each
    * step is one Spark training job, the TPE bookkeeping is O(|space|)
    * driver arithmetic. */
  def tuneSearch(basketDf: DataFrame, space: Seq[Params],
                 coPairs: DataFrame, budget: Int, seed: Long = 42L,
                 initRandom: Int = 3): (DataFrame, DataFrame) = {
    val spark = basketDf.sparkSession
    import spark.implicits._
    val evaluated =
      tpeOrder(space, budget, seed, initRandom)(
        p => evalObjective(basketDf, p, coPairs))
    val runs = evaluated.zipWithIndex.map { case ((i, obj), step) =>
      val p = space(i)
      (s"run_dim${p.vectorSize}_lr${p.stepSize}", obj, step.toLong)
    }.toDF("job_name", "objective", "start_ms")
    val table = Similarity.withIteration(runs, "start_ms")
      .withColumn("iteration", col("iteration").cast("long"))
    (table, Similarity.bestRow(table, "objective"))
  }

  /** Deterministic log-spaced grid over [lo, hi] — the dense
    * discretization that turns a continuous range (the reference's
    * `learning_rate ∈ [1e-4, 1e-3]`, `prod2vec_config.yaml:49-55`)
    * into a TPE-searchable candidate axis. Endpoints included. */
  def logGrid(lo: Double, hi: Double, n: Int): Seq[Double] = {
    require(lo > 0 && hi > lo, s"need 0 < lo < hi, got [$lo, $hi]")
    require(n >= 2, s"need n >= 2 grid points, got $n")
    (0 until n).map(i =>
      math.exp(math.log(lo) + (math.log(hi) - math.log(lo)) * i / (n - 1)))
  }

  /** Quantile bucket of a continuous dimension's value within the
    * candidate space's OWN empirical distribution: rank among the
    * sorted distinct values, folded onto at most `buckets` equal-count
    * bins. This is what makes a densely discretized continuous axis
    * (e.g. [[logGrid]]'s 16 learning rates) searchable: the Parzen
    * densities score BUCKET membership, so evidence from one good rate
    * transfers to its quantile neighbors instead of every float being
    * its own lonely category. With ≤ `buckets` distinct values each
    * value keeps its own bucket — the discrete-categorical behavior
    * (and every existing law) is the degenerate case. */
  private[graft] def quantileBucket(values: Seq[Double], v: Double,
                                    buckets: Int = 4): Int = {
    val sorted = values.distinct.sorted
    val r = sorted.indexOf(v)
    require(r >= 0, s"value $v not in the candidate space's dimension")
    r * math.min(buckets, sorted.size) / sorted.size
  }

  /** The TPE search core, Spark-free: returns the (space index,
    * objective) evaluations in evaluation order. Extracted so the
    * search dynamics — warmup, γ-split, bucketed densities,
    * convergence — are law-checkable against a closed-form objective
    * without training a model per step. */
  private[graft] def tpeOrder(space: Seq[Params], budget: Int, seed: Long,
                              initRandom: Int)(
                              objective: Params => Double): Seq[(Int, Double)] = {
    require(space.nonEmpty, "tuneSearch needs a non-empty space")
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val rnd = new scala.util.Random(seed)
    val n = math.min(budget, space.size)
    // per-dimension views of a candidate (the tree structure — here one
    // flat level): categorical densities per dimension, with the
    // continuous stepSize axis quantile-bucketed against the space's
    // own distribution (integer axes stay exact categories — their
    // candidate counts are small by construction)
    val stepVals = space.map(_.stepSize)
    def dims(p: Params): Seq[(String, String)] = Seq(
      "vectorSize" -> p.vectorSize.toString,
      "windowSize" -> p.windowSize.toString,
      "maxIter" -> p.maxIter.toString,
      "minCount" -> p.minCount.toString,
      "stepSize" -> quantileBucket(stepVals, p.stepSize).toString,
      "maxSentenceLength" -> p.maxSentenceLength.toString)
    val warmup = rnd.shuffle(space.indices.toList).take(math.min(initRandom, n))
    val evaluated = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    warmup.foreach { i => evaluated(i) = objective(space(i)) }
    while (evaluated.size < n) {
      val obs = evaluated.toSeq
      // γ-quantile split: the best ~25% (at least 1) are "good"
      val sorted = obs.sortBy(_._2)
      val nGood = math.max(1, (sorted.size * 0.25).toInt)
      val good = sorted.take(nGood).map(_._1)
      val bad = sorted.drop(nGood).map(_._1)
      def density(members: Seq[Int])(cand: Params): Double =
        dims(cand).map { case (d, v) =>
          val cnt = members.count(i => dims(space(i)).contains(d -> v))
          val distinct = space.map(p => dims(p).toMap.apply(d)).distinct.size
          (cnt + 1.0) / (members.size + distinct.toDouble)
        }.product
      val l = density(good) _
      val g = density(bad) _
      val next = space.indices
        .filterNot(evaluated.contains)
        .maxBy(i => (l(space(i)) / g(space(i)), -i)) // deterministic tie
      evaluated(next) = objective(space(next))
    }
    evaluated.toSeq
  }
}
