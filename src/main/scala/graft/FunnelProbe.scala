package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch funnel-stage cost probe (not part of the driver contract):
  * times each stage of the q62 curation funnel in isolation over the
  * sf fixture, with the Bench session confs, so the per-stage budget
  * of the funnel family (q62/q70/q77/q80/q93/q98/q102/q274/q277) is
  * visible without the Spark UI.
  *
  * Usage: runMain graft.FunnelProbe
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.conf.Sessions.recommendedConfs(
        shufflePartitions = cpus.toInt, maxPartitionBytes = 128L << 20)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Text}

    def timeIt[A](label: String)(body: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = body
      println(f"[funnel] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    try {
      val w = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      w.select(xxhash64(w.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).collect()
    } catch { case _: Throwable => () }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val normed = timeIt("normed+gates materialize (persist)") {
        val base = docs.select(col("doc_id"),
            Text.normalize(col("text")).as("text"), col("lang"), col("source"))
          .filter(length(col("text")) > 0)
          .withColumn("__t", Text.tokens(col("text")))
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            Text.langIdTextColumn(col("text")).as("__pred_lang"),
            Text.qualityScoreColumn(col("text")).as("__q"),
            Text.dupNgramRatioColumn(col("__t"), SparkEntry.RepetitionN)
              .as("__dup"))
          .persist()
        base.count()
        base
      }
      val tiered = normed
        .filter(col("__pred_lang").isin("en"))
        .filter(col("__q") >= SparkEntry.CurateMinQuality)
        .filter(col("__dup").isNull ||
          col("__dup") <= SparkEntry.CurateMaxDupRatio)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val exact = timeIt("exact dedup materialize (persist)") {
        val e = Dedup.dedupExact(tiered, "doc_id", "text").persist()
        e.count(); e
      }
      val shingled = timeIt("shingles materialize (persist)") {
        val sh = exact.select(col("doc_id"),
          Text.shingles(Text.tokens(col("text")), SparkEntry.ShingleN)
            .as("shingles")).persist()
        sh.count(); sh
      }
      val sigs = timeIt("minhash signatures (noop)") {
        val s = Dedup.minhashSignatures(shingled, "doc_id", SparkEntry.NumPerms)
        noop(s); s
      }
      val cands = timeIt("lsh bands + candidate pairs (noop)") {
        val c = Dedup.lshCandidatePairs(
          Dedup.lshBands(sigs, "doc_id", SparkEntry.LshBands,
            SparkEntry.LshRows), "doc_id")
        noop(c); c
      }
      val verified = timeIt("jaccard verify (noop)") {
        val v = Dedup.jaccardVerify(cands, shingled, "doc_id",
          SparkEntry.JaccardTau)
        noop(v); v
      }
      val clusters = timeIt("nearDupClusters fixpoint") {
        Dedup.nearDupClusters(verified, "doc_id")
      }
      val near = timeIt("near survivors materialize (persist)") {
        val drops = clusters.filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id"))
        val n = exact.join(drops, Seq("doc_id"), "left_anti").persist()
        n.count(); n
      }
      timeIt("chunk explode + checksum") {
        val ch = Text.chunk(near, "text", SparkEntry.CurateChunkTokens)
          .orderBy("doc_id", "chunk_idx")
        ch.select(xxhash64(ch.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).collect()
      }
      timeIt("exportShards manifest (collect)") {
        val (_, manifest) = graft.app.CorpusPipeline.exportShards(
          near.select(col("doc_id"), col("text"), col("lang"), col("source")),
          SparkEntry.EpochWeights, SparkEntry.EpochBudget,
          SparkEntry.EpochRealizeSalt, SparkEntry.PackSeqTokens,
          SparkEntry.PackShards)
        manifest.collect()
      }
      Seq(near, shingled, exact, normed).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
