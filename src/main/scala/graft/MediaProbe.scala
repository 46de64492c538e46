package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch media-chain cost probe (not part of the driver contract):
  * which stage of q154 (encode PNG → decode grid → aHash → simhash
  * band join) owns the seconds?
  *
  * Usage: runMain graft.MediaProbe
  */
object MediaProbe {
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
    import graft.ops.{Dedup, Multimodal}

    def timeIt[A](label: String)(body: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = body
      println(f"[media] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      timeIt("encodePng (noop)") {
        noop(Multimodal.encodePng(docs, "doc_id", "text",
          SparkEntry.MediaGridSide))
      }
      timeIt("encode + decodeGrayGrid (noop)") {
        noop(Multimodal.decodeGrayGrid(
          Multimodal.encodePng(docs, "doc_id", "text",
            SparkEntry.MediaGridSide), SparkEntry.MediaGridSide))
      }
      timeIt("encode + decode + aHash (noop)") {
        noop(Multimodal.aHashFromGrid(Multimodal.decodeGrayGrid(
          Multimodal.encodePng(docs, "doc_id", "text",
            SparkEntry.MediaGridSide), SparkEntry.MediaGridSide)))
      }
      timeIt("full q154 chain (noop, no orderBy)") {
        noop(Dedup.simhashPairs(
          Multimodal.aHashFromGrid(Multimodal.decodeGrayGrid(
            Multimodal.encodePng(docs, "doc_id", "text",
              SparkEntry.MediaGridSide), SparkEntry.MediaGridSide)),
          "doc_id", SparkEntry.MaxHamming))
      }
    }
    spark.stop()
  }
}
