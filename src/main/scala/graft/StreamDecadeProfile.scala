package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for the streaming-certification cost model (not part
  * of the driver contract): replays the q255 plumbing — documents
  * staged as N parquet files, `maxFilesPerTrigger = 1` file stream
  * through `curateStream`'s stateless prefix into a memory sink — at
  * `SPARK_GRAFT_SF_DIR`, for each file count in args (default `4 32`).
  * Holding SF fixed and varying ONLY the trigger count isolates the
  * per-trigger overhead from the per-row cost: if the q255 path's cost
  * were per-row, 32 files would run like 4; if it is per-trigger (the
  * claim), the delta divided by the 28 extra triggers prices a trigger.
  * Two back-to-back runs per point; read the min. */
object StreamDecadeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val fileCounts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(4, 32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()

    def runOnce(files: Int): (Double, Long) = {
      val staged = java.nio.file.Files
        .createTempDirectory("stream_decade_src").toString
      docs.repartition(files).write.mode("overwrite").parquet(staged)
      val t0 = System.nanoTime()
      val sdf = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
      val out = graft.streaming.StreamOps.curateStream(sdf,
        SparkEntry.CurateLangs, SparkEntry.CurateMinQuality)
      val sink = s"sd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally { q.stop() }
      val n = spark.table(sink).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sql(s"DROP TABLE IF EXISTS $sink")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
      (dt, n)
    }
    println(f"sf_dir=$sfDir docs=$nDocs")
    for (files <- fileCounts) {
      val (t1, n1) = runOnce(files)
      val (t2, n2) = runOnce(files)
      assert(n1 == n2, s"rows diverged: $n1 vs $n2")
      println(f"files=$files%-4d run1=$t1%7.2f s  run2=$t2%7.2f s  " +
        f"min=${math.min(t1, t2)}%7.2f s  rows=$n1")
    }
    spark.stop()
  }
}
