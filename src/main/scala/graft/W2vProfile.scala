package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Word2Vec.fit decade profile (round-13 task: the one reference-core
  * component never measured past q37's 10k-basket slice).
  *
  * The driver ships no sf1/sf10 lineitem and GenScale scales only the
  * document-side tables, so the scaled BASKET corpora are synthesized
  * here: sf0.1's real baskets replicated `factor`× with disjoint
  * order-id ranges, token space unchanged — tokens grow linearly (the
  * trainer's cost driver; vocabulary only enters through the
  * log-depth hierarchical-softmax tree, so a fixed vocab measures the
  * throughput slope cleanly).
  *
  * Measures, warm (one untimed small fit absorbs classload/codegen):
  * factor ∈ {1, 10, 100} ≈ sf0.1/sf1/sf10 token mass, numPartitions ∈
  * {1, 8} — the MLlib determinism trade (1 partition + fixed seed is
  * bit-reproducible; 8 partitions average gradients per iteration and
  * reproduce only statistically). Output: one line per
  * (factor, numPartitions) with tokens, fit seconds, and tokens/sec.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.W2vProfile [factors...]
  *
  * `SPARK_GRAFT_W2V_DIM` / `SPARK_GRAFT_W2V_ITERS` /
  * `SPARK_GRAFT_W2V_NP` (defaults 16 / 1 / "1,8") override the
  * trained dimension, epoch count and partition list — the round-15
  * task prices the REFERENCE's actual operating point
  * (`model_train.py:97-124` + `prod2vec_config.yaml:34-48`:
  * dim=1024, 15 epochs) on the sf0.1 baskets instead of the small
  * defaults the decade slope used. Each line also reports the JVM's
  * peak heap across the fit (max over per-pool `getPeakUsage`,
  * reset before each fit) — the "does the reference's config fit an
  * executor" number.
  *
  * Heap: in local mode the driver IS the executor, and the heap is
  * fixed at JVM launch — a `spark.driver.memory` conf set here would
  * be a silent no-op (sbt forks the JVM before this main runs). The
  * factor=100 profile needs ~48g: pass it via the build's env hook,
  * `SPARK_DRIVER_MEM=48g sbt "runMain graft.W2vProfile"` (build.sbt
  * turns it into the forked JVM's -Xmx).
  */
object W2vProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = graft.ml.Prod2Vec.baskets(
      graft.ops.Sources.table(spark, sfDir, "lineitem"))

    def scaled(factor: Int): DataFrame =
      if (factor == 1) base
      else base.crossJoin(
          spark.range(factor.toLong).select(col("id").as("__copy")))
        .select((col("order_id") + col("__copy") * lit(1000000000L))
          .as("order_id"), col("tokens"))

    // warm the trainer's classload/codegen path off the clock
    graft.ml.Prod2Vec.train(
      Seq(Seq("a", "b"), Seq("a", "c"), Seq("b", "c")).toDF("tokens"),
      graft.ml.Prod2Vec.Params(vectorSize = 4, minCount = 1,
        numPartitions = 1)).getVectors.count()

    val dim = sys.env.getOrElse("SPARK_GRAFT_W2V_DIM", "16").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_W2V_ITERS", "1").toInt
    val nps = sys.env.getOrElse("SPARK_GRAFT_W2V_NP", "1,8")
      .split(",").map(_.trim.toInt).toSeq
    import scala.jdk.CollectionConverters._
    def pools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    for (f <- factors) {
      val corpus = scaled(f).persist()
      val nBaskets = corpus.count()
      val nTokens = corpus.select(sum(size(col("tokens")))).head().getLong(0)
      for (np <- nps) {
        pools.foreach(_.resetPeakUsage())
        val t0 = System.nanoTime()
        val model = graft.ml.Prod2Vec.train(corpus,
          graft.ml.Prod2Vec.Params(vectorSize = dim, maxIter = iters,
            numPartitions = np))
        val vocab = model.getVectors.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val peakGb = pools.map(_.getPeakUsage.getUsed).sum / 1e9
        println(f"factor=$f%-4d np=$np dim=$dim iters=$iters " +
          f"baskets=$nBaskets%-9d tokens=$nTokens%-10d vocab=$vocab%-6d " +
          f"fit=$sec%8.2f s tok_per_sec=${nTokens / sec}%12.0f " +
          f"peak_heap=$peakGb%6.2f GB")
      }
      corpus.unpersist(blocking = false)
    }
    spark.stop()
  }
}
