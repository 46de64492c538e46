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

    for (f <- factors) {
      val corpus = scaled(f).persist()
      val nBaskets = corpus.count()
      val nTokens = corpus.select(sum(size(col("tokens")))).head().getLong(0)
      for (np <- Seq(1, 8)) {
        val t0 = System.nanoTime()
        val model = graft.ml.Prod2Vec.train(corpus,
          graft.ml.Prod2Vec.Params(numPartitions = np))
        val vocab = model.getVectors.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"factor=$f%-4d np=$np baskets=$nBaskets%-9d " +
          f"tokens=$nTokens%-10d vocab=$vocab%-6d fit=$sec%8.2f s " +
          f"tok_per_sec=${nTokens / sec}%12.0f")
      }
      corpus.unpersist(blocking = false)
    }
    spark.stop()
  }
}
