package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** README's BPE batched-learning measurement: rounds (= driver-paced
  * Spark jobs) and wall time at batch ∈ {1, 8, 32} for a fixed merge
  * budget on the given SF's documents. The batch guard's ACCEPTANCE
  * RATE on real Zipfian pair counts is the whole scale claim — the
  * equivalence law says batching is never wrong, this shows it is
  * actually near-`batch` effective. Also cross-checks that every batch
  * size produced the bit-identical merge table (xxhash64 fold).
  *
  * Usage: runMain graft.BpeBatchProfile [sfDir] [numMerges]
  */
object BpeBatchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // `synth:<types>` instead of an SF dir: a deterministic Zipfian
    // word-count table with a REALISTIC vocabulary width. The driver
    // fixture's ~31 word types exhaust BPE at ~90 merges and force
    // batch-mates onto shared characters — real corpora have 10^5+
    // types, and that is where near-batch acceptance shows.
    val wc =
      if (sfDir.startsWith("synth:")) {
        val types = sfDir.stripPrefix("synth:").toInt
        val letters = "etaoinshrdlucmfwypvbgkjqxz"
        val lw = letters.indices.map(i => math.pow(0.82, i.toDouble))
        val lcum = lw.scanLeft(0.0)(_ + _).tail.map(_ / lw.sum)
        (1 to types).map { r =>
          val rnd = new java.util.Random(r * 0x9e3779b97f4a7c15L)
          val len = 3 + rnd.nextInt(9)
          val w = (0 until len).map { _ =>
            val x = rnd.nextDouble()
            letters(lcum.indexWhere(x <= _))
          }.mkString
          (w + r, (1e7 / math.pow(r.toDouble, 1.1)).toLong + 1L)
        }.toDF("word", "count")
      } else
        graft.ops.Bpe.wordCounts(
          spark.read.parquet(s"$sfDir/documents.parquet"), "text")
    wc.persist().count() // shared input; don't bill its build to batch=1
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))).head().getLong(0)
    val rows = Seq(1, 8, 32).map { b =>
      val t0 = System.nanoTime()
      val learned = graft.ops.Bpe.learn(wc, numMerges, batch = b)
      val h = checksum(learned.merges)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"batch=$b%-3d rounds=${learned.rounds}%-4d " +
        f"merges=$numMerges wall=$secs%6.1f s hash=$h%016x")
      (b, learned.rounds, secs, h)
    }
    require(rows.map(_._4).distinct.size == 1,
      "merge tables diverged across batch sizes — equivalence violated")
    println("MERGE_TABLES_IDENTICAL=true")
    spark.stop()
  }
}
