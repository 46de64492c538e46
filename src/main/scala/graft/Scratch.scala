package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiments (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"),
      unix_millis(col("ts")).as("ms")).orderBy("event_id").show(3, false)
    // split semantics with trailing space
    spark.sql("SELECT split('a b ', ' ') AS s, split('a  b', ' ') AS s2").show(false)
    spark.stop()
  }
}
