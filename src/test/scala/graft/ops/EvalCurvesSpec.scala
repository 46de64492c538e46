package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalCurvesSpec extends SparkSpec {
  import spark.implicits._

  test("thresholdSweep: exact confusion counts per distinct score; " +
      "F1 tie breaks to the HIGHER threshold") {
    val df = Seq((0.9, true), (0.8, true), (0.8, false), (0.5, false),
      (0.3, true), (0.3, false), (0.1, false)).toDF("score", "y")
    val r = Quality.thresholdSweep(df, "score", col("y"))
      .orderBy(col("threshold").desc)
      .as[(Double, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(r == Seq(
      (0.9, 1L, 0L, 2L, 1.0, 0.333333333, 0.5, false),
      (0.8, 2L, 1L, 1L, 0.666666667, 0.666666667, 0.666666667, true),
      (0.5, 2L, 2L, 1L, 0.5, 0.666666667, 0.571428571, false),
      (0.3, 3L, 3L, 0L, 0.5, 1.0, 0.666666667, false),
      (0.1, 3L, 4L, 0L, 0.428571429, 1.0, 0.6, false)))
  }

  test("aucByGroup: perfect / reversed / single-class / all-tied " +
      "groups in one pass") {
    val df = Seq(
      ("A", 0.9, true), ("A", 0.8, true), ("A", 0.2, false),
      ("B", 0.1, true), ("B", 0.9, false),
      ("C", 0.5, true), ("C", 0.7, true),
      ("D", 0.5, true), ("D", 0.5, false)).toDF("g", "score", "y")
    val r = Quality.aucByGroup(df, "g", col("y"), "score")
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(r.map(t => (t._1, t._5)) == Seq(
      ("A", Some(1.0)), ("B", Some(0.0)), ("C", None), ("D", Some(0.5))))
  }

  test("gainsTable: quintiles on distinct scores — exact rank cuts; " +
      "an all-tied corpus reports the whole tie block at every tile") {
    val df = (1 to 10).map(i => (i.toDouble, i >= 8)).toDF("score", "y")
    val r = Quality.gainsTable(df, "score", col("y"), 5)
      .orderBy("tile")
      .as[(Long, Double, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 9.0, 2L, 2L, 0.666666667, 3.333333333),
      (2L, 7.0, 4L, 3L, 1.0, 2.5),
      (3L, 5.0, 6L, 3L, 1.0, 1.666666667),
      (4L, 3.0, 8L, 3L, 1.0, 1.25),
      (5L, 1.0, 10L, 3L, 1.0, 1.0)))
    val tied = Seq.fill(6)((0.5, true)).toDF("score", "y")
    val rt = Quality.gainsTable(tied, "score", col("y"), 3)
      .orderBy("tile").as[(Long, Double, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rt.forall(t => t._3 == 6L && t._4 == 6L && t._5 == 1.0))
  }
}
