package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // Checksum over EVERY output column — a bare .count() lets
        // Catalyst prune expensive computed columns out of the plan, so
        // the "benchmark" would never evaluate them.
        // bit_xor fold: order-independent and cannot overflow (sum of
        // xxhash64 Longs throws ARITHMETIC_OVERFLOW under ANSI mode).
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).collect()
      } catch {
        case e: Throwable =>
          errors += name -> e.toString.replaceAll("""["\\\n\r\t]""", " ").take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
