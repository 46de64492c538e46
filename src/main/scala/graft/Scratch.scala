package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = ops.Sources.table(spark, sfDir, "documents")
    // replicate q93's gate chain manually
    val masked = docs.select(col("doc_id"), col("lang"), col("source"),
      Text.piiMasked(col("text")).as("text"))
    val normed = masked.select(col("doc_id"), col("lang"), col("source"),
      Text.normalize(col("text")).as("text"))
      .filter(length(col("text")) > 0)
    val inLang = normed.filter(col("lang").isin("en"))
    val quality = inLang.join(
      Text.qualityScore(inLang, "text")
        .filter(col("quality_score") >= SparkEntry.CurateMinQuality)
        .select("doc_id"), Seq("doc_id"))
      .persist()
    time("quality.count")(quality.count())
    val good = quality.join(
      Text.repetitionStats(quality, "text", SparkEntry.RepetitionN)
        .filter(col("dup_ngram_ratio").isNull ||
          col("dup_ngram_ratio") <= SparkEntry.CurateMaxDupRatio)
        .select("doc_id"), Seq("doc_id"))
      .persist()
    time("good.count")(good.count())
    val ppl = Text.perplexityBuckets(good, "text", "lang", 3)
    time("pplBuckets.count")(ppl.count())
    val tiered = good.join(
      ppl.filter(col("bucket").isin("head", "middle")).select("doc_id"),
      Seq("doc_id"))
    time("tiered.count")(tiered.count())
    time("tiered.count2")(tiered.count())
    val exact = Dedup.dedupExact(tiered, "doc_id", "text").persist()
    time("exact.count")(exact.count())
    val shingled = exact.select(col("doc_id"),
      Text.shingles(Text.tokens(col("text")), SparkEntry.ShingleN)
        .as("shingles")).persist()
    time("shingled.count")(shingled.count())
    val near = Dedup.dedupNearClustered(exact, "doc_id", shingled,
      SparkEntry.NumPerms, SparkEntry.LshBands, SparkEntry.LshRows,
      SparkEntry.JaccardTau).persist()
    time("near.count")(near.count())
    val chunks = Text.chunk(near, "text", 64)
    time("chunks.count")(chunks.count())
    spark.stop()
  }
}
