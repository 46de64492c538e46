package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** (score, label) rows: `n` rows at `score`, `pos` of them labeled. */
  private def mk(buckets: Seq[(Double, Int, Int)]) =
    buckets.flatMap { case (s, n, p) =>
      Seq.fill(p)((s, true)) ++ Seq.fill(n - p)((s, false))
    }.toDF("score", "y")

  test("isotonicCalibration: the textbook PAV pool — a decreasing " +
      "violation pools to the weighted average of its block") {
    // rates [0.2, 0.1, 0.4] over equal buckets -> [0.15, 0.15, 0.4]
    val df = mk(Seq((0.1, 10, 2), (0.5, 10, 1), (0.9, 10, 4)))
    val r = Quality.isotonicCalibration(df, "score", col("y"), 3)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq((0L, 10L, 2L, 0.2, 0.15), (1L, 10L, 1L, 0.1, 0.15),
      (2L, 10L, 4L, 0.4, 0.4)))
  }

  test("isotonicCalibration: unequal bucket sizes pool by WEIGHT, " +
      "and an already-monotone profile is returned unchanged") {
    // rates [0.5 (n=2), 0.25 (n=8)] -> pooled 3/10 = 0.3 for both
    val v = mk(Seq((0.2, 2, 1), (0.7, 8, 2)))
    val rv = Quality.isotonicCalibration(v, "score", col("y"), 2)
      .orderBy("bucket").as[(Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rv.map(_._5) == Seq(0.3, 0.3))
    val mono = mk(Seq((0.1, 10, 1), (0.5, 10, 5), (0.9, 10, 9)))
    val rm = Quality.isotonicCalibration(mono, "score", col("y"), 3)
      .orderBy("bucket").as[(Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rm.forall(t => t._4 == t._5), "monotone input is a fixpoint")
  }

  test("reliabilityDiagram + brierDecomposition: hand-computed fixture " +
      "where within-bucket variance is 0, so REL - RES + UNC = Brier") {
    // bin0: scores 0.1 (n=2, pos=1); bin1: scores 0.9 (n=2, pos=2)
    val df = mk(Seq((0.1, 2, 1), (0.9, 2, 2)))
    val rd = Quality.reliabilityDiagram(df, "score", col("y"), 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rd == Seq(
      (0L, 2L, 1L, 0.1, 0.5, 0.41),
      (1L, 2L, 2L, 0.9, 1.0, 0.01)))
    val bd = Quality.brierDecomposition(df, "score", col("y"), 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // N=4, P=3: brier = (0.82*2 + 0.01*2)/4 = 0.21; REL = 0.085;
    // RES = 0.0625; UNC = 0.1875; identity holds (scores constant
    // within each bucket): 0.085 - 0.0625 + 0.1875 = 0.21
    assert(bd == Seq((4L, 3L, 0.75, 0.21, 0.085, 0.0625, 0.1875)))
    assert(math.abs(bd.head._5 - bd.head._6 + bd.head._7 - bd.head._4)
      < 1e-12)
  }

  test("brierDecomposition: a perfectly calibrated constant forecast " +
      "has REL = 0 and RES = 0; brier = uncertainty") {
    // score 0.5 everywhere, half positive
    val df = mk(Seq((0.5, 10, 5)))
    val bd = Quality.brierDecomposition(df, "score", col("y"), 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(bd == ((10L, 5L, 0.5, 0.25, 0.0, 0.0, 0.25)))
  }

  test("brierDecomposition: a bucket past the exact-rational operand " +
      "bound takes the divide-before-square fallback — total, and " +
      "equal to the textbook values within double precision") {
    // 250k identical scores land in ONE bucket — past the ~2.2e5-row
    // REL bound where DECIMAL(38,0) would overflow the exact d² path
    // (rounds 11-12 raised a contract error here; the operator is now
    // total via the reduced-precision fallback)
    val n = 250000L
    val p = 100000L // pos rate 0.4 at constant forecast 0.5
    val big = spark.range(n)
      .select(lit(0.5).as("score"), (col("id") < p).as("y"))
    val bd = Quality.brierDecomposition(big, "score", col("y"), 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(bd._1 == n && bd._2 == p)
    // one bucket: REL = (0.5 - 0.4)^2 = 0.01, RES = 0 (bucket mean ==
    // global mean), UNC = 0.4*0.6 = 0.24, brier = 0.25
    assert(bd._4 == 0.25, s"brier ${bd._4}")
    assert(math.abs(bd._5 - 0.01) < 1e-9, s"reliability ${bd._5}")
    assert(bd._6 == 0.0, s"resolution ${bd._6}")
    assert(bd._7 == 0.24, s"uncertainty ${bd._7}")
    // the small-bucket exact path is unchanged: same distribution at
    // 1/1000 the rows decomposes to the identical values
    val small = spark.range(250L)
      .select(lit(0.5).as("score"), (col("id") < 100L).as("y"))
    val bs = Quality.brierDecomposition(small, "score", col("y"), 2)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(math.abs(bs._5 - bd._5) < 1e-9 && bs._6 == bd._6)
  }

  test("isotonicCalibration: fitted is monotone non-decreasing on a " +
      "noisy profile; score=1.0 clamps into the top bucket") {
    val noisy = mk(Seq((0.05, 7, 3), (0.15, 5, 0), (0.35, 9, 4),
      (0.55, 4, 4), (0.65, 6, 2), (0.85, 8, 5), (1.0, 3, 3)))
    val r = Quality.isotonicCalibration(noisy, "score", col("y"), 10)
      .orderBy("bucket").as[(Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(r.map(_._1).max == 9L, "score 1.0 lands in bucket bins-1")
    assert(r.map(_._5) == r.map(_._5).sorted, "fitted monotone")
    // total positive mass is conserved by PAV (sum n*fitted = sum pos)
    val mass = r.map(t => t._2 * t._5).sum
    assert(math.abs(mass - r.map(_._3).sum) < 1e-6)
  }
}
