package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch streaming-cost probe (not part of the driver contract):
  * where does a 4-trigger micro-batch replay spend its seconds?
  * Times the q261-shaped stateful replay (windowedCounts over a
  * 4-file staged source) and the q255-shaped stateless one
  * (curateStream), at several `spark.sql.shuffle.partitions`
  * settings — state-store files per micro-batch scale with that conf,
  * so the delta isolates state-store overhead from the per-trigger
  * planning floor.
  *
  * Usage: runMain graft.StreamProbe [cpus]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = graft.conf.Sessions.recommendedConfs(
        shufflePartitions = cpus.toInt, maxPartitionBytes = 128L << 20)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def deleteDir(path: String): Unit = {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }

    def timeIt(label: String)(body: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val events = graft.ops.Sources.eventsNs(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def statefulReplay(): Unit = {
      val staged = java.nio.file.Files
        .createTempDirectory("probe261_src").toString
      events.repartition(4).write.mode("overwrite").parquet(staged)
      val sdf = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
      val out = graft.streaming.StreamOps.windowedCounts(sdf,
        "3600000 milliseconds", "60 days")
      val sink = s"probe261_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sink).count()
      deleteDir(staged)
    }

    def statelessReplay(): Unit = {
      val staged = java.nio.file.Files
        .createTempDirectory("probe255_src").toString
      docs.repartition(4).write.mode("overwrite").parquet(staged)
      val sdf = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
      val out = graft.streaming.StreamOps.curateStream(sdf,
        SparkEntry.CurateLangs, SparkEntry.CurateMinQuality)
      val sink = s"probe255_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sink).count()
      deleteDir(staged)
    }

    // staging cost alone (write 4 parquet files)
    timeIt("staging write only") {
      val staged = java.nio.file.Files
        .createTempDirectory("probeS_src").toString
      docs.repartition(4).write.mode("overwrite").parquet(staged)
      deleteDir(staged)
    }

    Seq(cpus.toInt, 8, 2).foreach { sp =>
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      timeIt(s"stateful windowedCounts replay sp=$sp (warm1)")(statefulReplay())
      timeIt(s"stateful windowedCounts replay sp=$sp (warm2)")(statefulReplay())
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toInt)
    timeIt("stateless curateStream replay (warm1)")(statelessReplay())
    timeIt("stateless curateStream replay (warm2)")(statelessReplay())

    // the same transform as a BATCH over the same rows — separates the
    // kernel cost from the micro-batch machinery
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timeIt("curateStream transform as batch (warm1)") {
      noop(graft.streaming.StreamOps.curateStream(docs,
        SparkEntry.CurateLangs, SparkEntry.CurateMinQuality))
    }
    timeIt("curateStream transform as batch (warm2)") {
      noop(graft.streaming.StreamOps.curateStream(docs,
        SparkEntry.CurateLangs, SparkEntry.CurateMinQuality))
    }
    timeIt("langIdTextColumn alone as batch") {
      noop(docs.select(graft.ops.Text.langIdTextColumn(col("text")).as("pl")))
    }
    // kernel variants for the segment-hit count (×3 each)
    val stop = graft.ops.Text.EnStopwords
    def rep(label: String)(c: => org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach(i => timeIt(s"$label #$i")(noop(docs.select(c.as("v")))))
    rep("sC hof filter-isin") {
      size(filter(split(col("text"), " "),
        w => w.isin(stop.map(lit): _*))).cast("long")
    }
    rep("sC regexp_count lookbehind") {
      regexp_count(concat(lit(" "), col("text"), lit(" ")),
        lit(stop.mkString("(?<= )(", "|", ")(?= )"))).cast("long")
    }
    rep("sC regexp_count consume-left") {
      regexp_count(concat(lit(" "), col("text"), lit(" ")),
        lit(stop.mkString(" (", "|", ")(?= )"))).cast("long")
    }
    rep("sC aggregate-hof single pass") {
      aggregate(split(col("text"), " "), lit(0L),
        (acc, w) => acc + when(w.isin(stop.map(lit): _*), 1L).otherwise(0L))
    }
    timeIt("qualityScore alone as batch") {
      noop(graft.ops.Text.qualityScore(docs, "text"))
    }
    timeIt("normalize alone as batch") {
      noop(docs.select(graft.ops.Text.normalize(col("text")).as("t")))
    }
    // per-trigger fixed cost: same rows, 2 files per trigger = 2 batches
    def statelessReplayMf(mf: Int): Unit = {
      val staged = java.nio.file.Files
        .createTempDirectory("probe255b_src").toString
      docs.repartition(4).write.mode("overwrite").parquet(staged)
      val sdf = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", mf).parquet(staged)
      val out = graft.streaming.StreamOps.curateStream(sdf,
        SparkEntry.CurateLangs, SparkEntry.CurateMinQuality)
      val sink = s"probe255b_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sink).count()
      deleteDir(staged)
    }
    timeIt("stateless replay maxFilesPerTrigger=4 (1 batch)")(statelessReplayMf(4))
    timeIt("stateless replay maxFilesPerTrigger=4 again")(statelessReplayMf(4))
    spark.stop()
  }
}
