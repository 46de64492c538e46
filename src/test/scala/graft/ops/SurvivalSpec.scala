package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** (user, firstPeriod, lastPeriod) → two events pinning the span;
    * periodNs = 1 so ts IS the period. */
  private def ev(users: Seq[(Long, Long, Long)]) =
    users.flatMap { case (u, f, l) => Seq((u, f), (u, l)) }
      .toDF("user_id", "ts")

  // Textbook KM fixture (margin 10, horizon 100): deaths at t=1,3,5;
  // censorings at t=2,6. S(1)=4/5, S(3)=4/5·2/3, S(5)=·1/2.
  private val textbook = Seq(
    (1L, 0L, 1L),    // died, t=1
    (2L, 98L, 100L), // censored, t=2 (pins the horizon)
    (3L, 0L, 3L),    // died, t=3
    (4L, 0L, 5L),    // died, t=5
    (5L, 94L, 100L)) // censored, t=6

  test("survivalCurve: matches the hand-computed product-limit curve " +
      "with interleaved censoring; Greenwood SE exact") {
    val rows = Events.survivalCurve(ev(textbook), 1L, 10)
      .collect().toSeq
    val byT = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.map(_.getLong(0)) == Seq(1L, 2L, 3L, 5L, 6L))
    def chk(t: Long, atRisk: Long, d: Long, c: Long, s: Double): Unit = {
      val r = byT(t)
      assert(r.getLong(1) == atRisk, s"at_risk@$t")
      assert(r.getLong(2) == d, s"deaths@$t")
      assert(r.getLong(3) == c, s"censored@$t")
      assert(math.abs(r.getDouble(4) - s) < 1e-6, s"S($t)")
    }
    chk(1L, 5L, 1L, 0L, 0.8)
    chk(2L, 4L, 0L, 1L, 0.8) // censoring-only time: S unchanged
    chk(3L, 3L, 1L, 0L, 0.8 * 2 / 3)
    chk(5L, 2L, 1L, 0L, 0.8 * 2 / 3 * 0.5)
    chk(6L, 1L, 0L, 1L, 0.8 * 2 / 3 * 0.5)
    // Greenwood at t=3: S·sqrt(1/(5·4) + 1/(3·2))
    val se3 = byT(3L).getDouble(5)
    assert(math.abs(se3 -
      (0.8 * 2 / 3) * math.sqrt(1.0 / 20 + 1.0 / 6)) < 1e-6)
  }

  test("survivalCurve: no censoring -> KM equals the empirical " +
      "survival function") {
    // all last-activity well before the margin: every user died
    val users = Seq((1L, 0L, 2L), (2L, 0L, 2L), (3L, 0L, 4L),
      (4L, 0L, 7L), (5L, 90L, 100L)) // user 5 censored pins horizon
    val rows = Events.survivalCurve(ev(users), 1L, 5)
      .collect().filter(_.getLong(2) > 0) // death times only
    // empirical S among the 5 at risk: after t=2 -> 3/5, t=4 -> 2/5,
    // t=7 -> 1/5 (KM = empirical when no one is censored before t)
    val s = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(s(2L) - 0.6) < 1e-6)
    assert(math.abs(s(4L) - 0.4) < 1e-6)
    assert(math.abs(s(7L) - 0.2) < 1e-6)
  }

  test("survivalCurve: d_t = n_t sends survival exactly to 0.0 and " +
      "SE to NULL, with no ln(0) blowup") {
    // both users die at t=3 (horizon pinned by a third, earlier-dying
    // user so nothing is censored)
    val users = Seq((1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 1L))
    val df = Events.survivalCurve(ev(users).withColumn("ts",
      $"ts" * 10), 10L, 0) // also exercises periodNs division
    val rows = df.collect()
    val last = rows.last
    assert(last.getLong(0) == 3L && last.getLong(1) == 2L &&
      last.getLong(2) == 2L)
    assert(last.getDouble(4) == 0.0, "exact zero, not exp(-inf)")
    assert(last.isNullAt(5), "SE undefined at S=0")
  }

  test("survivalCurve: partitioning-invariant and multi-event users " +
      "collapse to one lifetime") {
    val many = textbook.flatMap { case (u, f, l) =>
      // noise events inside the span must not change the duration
      Seq((u, f, l), (u, (f + l) / 2, (f + l) / 2))
    }
    val a = Events.survivalCurve(ev(textbook), 1L, 10).collect().toSeq
    val b = Events.survivalCurve(ev(many).repartition(7), 1L, 10)
      .collect().toSeq
    assert(a == b)
  }
}
