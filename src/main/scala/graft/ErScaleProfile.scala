package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness for the exact-ER candidate-mass guard at decade
  * scale (not part of the driver contract): at `SPARK_GRAFT_SF_DIR`,
  * (1) show the pre-flight REFUSES the unguarded quadratic (the r11
  * sf10 DNF case) with the measured candidate mass in the message, and
  * (2) run the auto-sampled audit under the default budget and time
  * it — the sample-only contract executing in bounded wall-clock where
  * the exact form did not finish. sf10 wants `SPARK_DRIVER_MEM=48g`. */
object ErScaleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val budget = args.headOption.map(_.toLong)
      .getOrElse(graft.ops.Er.DefaultMaxCandidatePairs)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    println(s"sf_dir=$sfDir budget=$budget distinct_names=" +
      part.select("p_name").distinct().count())

    val t0 = System.nanoTime()
    try {
      graft.ops.Er.editJoin(part, "p_name", 2, budget).count()
      println(f"guard=NOT_TRIPPED (mass under budget) " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    } catch {
      case e: IllegalArgumentException =>
        println(f"guard=TRIPPED t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
          s"msg=${e.getMessage.take(200)}")
    }

    val t1 = System.nanoTime()
    val pairs = graft.ops.Er.editJoin(part, "p_name", 2, budget,
      autoSample = true).count()
    println(f"editJoin_sampled t=${(System.nanoTime() - t1) / 1e9}%8.1f s " +
      f"pairs=$pairs")

    val t2 = System.nanoTime()
    val ents = graft.ops.Er.resolveEntities(part, "p_name", 2, budget,
      autoSample = true).count()
    println(f"resolveEntities_sampled t=${(System.nanoTime() - t2) / 1e9}%8.1f s " +
      f"rows=$ents")
    spark.stop()
  }
}
