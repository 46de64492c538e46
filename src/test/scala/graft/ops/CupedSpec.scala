package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CupedSpec extends SparkSpec {
  import spark.implicits._

  private val Split = 1000L

  /** Events giving user u exactly `x` metric events pre-split and `y`
    * post-split, plus one unrelated event type. */
  private def ev(users: Seq[(Long, Int, Int)]) =
    users.flatMap { case (u, x, y) =>
      Seq.tabulate(x)(i => (u, "m", Split - 1 - i.toLong)) ++
        Seq.tabulate(y)(i => (u, "m", Split + i.toLong)) :+
        ((u, "other", Split))
    }.toDF("user_id", "event_type", "ts")

  test("cuped: y perfectly linear in x -> var_reduction = 1, both " +
      "adjusted means collapse to theta*xbar, z_adj NULL (se = 0)") {
    val df = ev((1L to 8L).map(u => (u, u.toInt, 2 * u.toInt)))
    val r = Events.cuped(df, "m", "lawSalt", Split).collect().head
    // theta = 2, xbar = 4.5 -> every adjusted score = 2*4.5 = 9
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    assert(r.getAs[Double]("adj_a") == 9.0)
    assert(r.getAs[Double]("adj_b") == 9.0)
    assert(r.isNullAt(r.fieldIndex("z_adj")), "zero adjusted variance")
  }

  test("cuped: constant pre-period (Var(x) = 0) -> NULL theta and " +
      "adjusted columns; raw means still reported") {
    val df = ev(Seq((1L, 1, 3), (2L, 1, 5), (3L, 1, 2), (4L, 1, 7)))
    val r = Events.cuped(df, "m", "lawSalt", Split).collect().head
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.isNullAt(r.fieldIndex("adj_a")))
    assert(r.isNullAt(r.fieldIndex("var_reduction")))
    assert(!r.isNullAt(r.fieldIndex("mean_a")) ||
      !r.isNullAt(r.fieldIndex("mean_b")))
  }

  test("cuped: matches an independent driver-side computation on a " +
      "mixed fixture; partitioning-invariant") {
    val users = Seq((1L, 3, 5), (2L, 0, 2), (3L, 7, 9), (4L, 2, 1),
      (5L, 4, 6), (6L, 1, 0), (7L, 6, 8), (8L, 0, 1), (9L, 5, 5),
      (10L, 2, 4))
    val df = ev(users)
    val r = Events.cuped(df, "m", "lawSalt", Split).collect().head
    // recover the hash arms with the operator's own expression, then
    // recompute everything independently in plain Scala
    val arms = df.select(col("user_id"),
        pmod(Portable.seededHash(lit("lawSalt"), col("user_id")), lit(2L))
          .as("arm")).distinct()
      .as[(Long, Long)].collect().toMap
    val xs = users.map(_._2.toDouble); val ys = users.map(_._3.toDouble)
    val n = users.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(v => v * v).sum
    val sxy = users.map(t => t._2.toDouble * t._3).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    def side(a: Long) = users.filter(t => arms(t._1) == a)
    def adjMean(a: Long) = {
      val s = side(a)
      s.map(_._3).sum.toDouble / s.size -
        theta * (s.map(_._2).sum.toDouble / s.size - xbar)
    }
    assert(side(0L).nonEmpty && side(1L).nonEmpty, "both arms populated")
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-8)
    assert(math.abs(r.getAs[Double]("adj_a") - adjMean(0L)) < 1e-8)
    assert(math.abs(r.getAs[Double]("adj_b") - adjMean(1L)) < 1e-8)
    val rp = Events.cuped(df.repartition(7), "m", "lawSalt", Split)
      .collect().head
    assert(rp == r, "partitioning-invariant")
  }
}
