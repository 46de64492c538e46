package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class FoldDotSpec extends SparkSpec {
  import spark.implicits._

  /** The declarative form FoldDot must match bit-for-bit. */
  private def declDot(a: org.apache.spark.sql.Column,
                      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to aggregate(zip_with) on random double arrays") {
    val rnd = new Random(7)
    val rows = Seq.fill(200) {
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)(rnd.nextGaussian()), Array.fill(n)(rnd.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      FoldDot($"a", $"b").as("fast"), declDot($"a", $"b").as("slow"))
    assert(cmp.filter($"fast" =!= $"slow" ||
      ($"fast".isNull =!= $"slow".isNull)).count() == 0)
  }

  test("bit-identical on float arrays (cast-to-double per element)") {
    val rnd = new Random(11)
    val rows = Seq.fill(100) {
      val n = 1 + rnd.nextInt(64)
      (Array.fill(n)(rnd.nextFloat()), Array.fill(n)(rnd.nextFloat()))
    }
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      FoldDot($"a", $"b").as("fast"), declDot($"a", $"b").as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
  }

  test("null array -> null; null element -> null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val out = df.select(FoldDot($"a", $"b").as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 1.0 * 3.0 + 2.0 * 4.0)

    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(1.0D, 2.0D) AS b")
    assert(withNullElem.select(FoldDot($"a", $"b")).head().isNullAt(0))
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // LocalTableScan skips codegen entirely — use range() so the Project
    // containing FoldDot sits inside a WholeStageCodegen span.
    val df = spark.range(4).select(
      array($"id".cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    val q = df.select(FoldDot($"a", $"b").as("d"))
    // the `*(n)` prefix on Project marks a WholeStageCodegen span
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [folddot("), plan)
    // and evaluates correctly through the codegen path
    assert(q.orderBy($"d").head().getDouble(0) == 0.0 * 3.0 + 2.0 * 4.0)
  }
}
