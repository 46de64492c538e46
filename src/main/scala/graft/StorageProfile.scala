package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Scratch A/B harness for [[graft.app.CorpusPipeline.Config.storageLevel]]
  * (not part of the driver contract): runs the q62 (chunks) and q77
  * (packed) funnels at `SPARK_GRAFT_SF_DIR` under each storage level
  * named in args (default `MEMORY_AND_DISK DISK_ONLY`), two back-to-back
  * runs each, and prints both times plus the warm min — the measurement
  * the third-decade study's block-manager-pressure attribution needs
  * (README "Third decade"). sf10 wants `SPARK_DRIVER_MEM=48g`; the
  * decade studies use 96g. `SPARK_GRAFT_FUNNELS` (default `q62,q77`)
  * picks the funnel variants — the fifth-decade point runs `q62`
  * alone (one funnel at 50M docs is the hour-scale budget). */
object StorageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val funnels = sys.env.getOrElse("SPARK_GRAFT_FUNNELS", "q62,q77")
      .split(",").map(_.trim).toSet
    val levels = (if (args.nonEmpty) args.toSeq
      else Seq("MEMORY_AND_DISK", "DISK_ONLY"))
      .map(n => n -> StorageLevel.fromString(n))
    // SPARK_GRAFT_CODEC (e.g. zstd) compresses shuffle + persisted RDD
    // blocks: the 50M-doc fifth-decade run writes ~90-100 GB of
    // DISK_ONLY persists + shingle shuffle under the default lz4 —
    // PAST this rig's free disk (measured: ENOSPC at stage 37, 103
    // min in) — while zstd's ~1.7x on text-heavy blocks fits it.
    // Same codec on both decade endpoints, or the ratio lies.
    val codec = sys.env.get("SPARK_GRAFT_CODEC")
    val spark = codec.foldLeft(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        (b, c) => b.config("spark.io.compression.codec", c) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.app.CorpusPipeline
    import SparkEntry._

    def cfg(level: StorageLevel, packed: Boolean) = CorpusPipeline.Config(
      keepLangs = CurateLangs, minQuality = CurateMinQuality,
      shingleN = ShingleN, minhashPerms = NumPerms, bands = LshBands,
      rowsPerBand = LshRows, jaccardTau = JaccardTau,
      chunkTokens = CurateChunkTokens,
      maxDupNgramRatio = Some(CurateMaxDupRatio), repetitionN = RepetitionN,
      packSeqTokens = if (packed) Some(PackSeqTokens) else None,
      packShards = PackShards, storageLevel = level)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def runOnce(level: StorageLevel, packed: Boolean): (Double, Long) = {
      // OUTSIDE the timed region: a driver GC lets the ContextCleaner
      // drop the PREVIOUS run's now-unreachable persisted blocks and
      // shuffle files before this run builds its own — at the 50M-doc
      // point the two runs' combined block mass otherwise exceeds the
      // rig's disk (and Bench gc's between timings for the same reason)
      System.gc()
      val t0 = System.nanoTime()
      val out = CorpusPipeline.curate(docs, cfg(level, packed),
        collectFunnel = false)
      val n = (if (packed) out.packed.get else out.chunks).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for ((name, lvl) <- levels; packed <- Seq(false, true)
         if funnels.contains(if (packed) "q77" else "q62")) {
      val q = if (packed) "q77_packed" else "q62_chunks"
      val (t1, n1) = runOnce(lvl, packed)
      // per-run line so a crashed/killed second run still leaves the
      // first on record (the ENOSPC lesson)
      println(f"$q%-12s $name%-16s run1=$t1%7.2f s  rows=$n1")
      val (t2, n2) = runOnce(lvl, packed)
      assert(n1 == n2, s"$q rows diverged across runs: $n1 vs $n2")
      println(f"$q%-12s $name%-16s run1=$t1%7.2f s  run2=$t2%7.2f s  " +
        f"min=${math.min(t1, t2)}%7.2f s  rows=$n1")
    }
    spark.stop()
  }
}
