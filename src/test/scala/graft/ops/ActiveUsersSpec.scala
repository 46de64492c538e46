package graft.ops

import graft.SparkSpec

class ActiveUsersSpec extends SparkSpec {
  import spark.implicits._

  private val D = 86400000000000L
  // A: days 10, 11; B: day 10; C: day 13 — a dark day (12) in range
  private def ev = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 13L),
      (1L, 10L)) // duplicate event same day — must not double-count
    .map { case (u, d) => (u, d * D + 12345L) }
    .toDF("user_id", "ts")

  test("activeUsers: window wider than span — WAU accumulates, dark " +
      "day reports dau=0 with stickiness 0.0, growth ledger exact") {
    val r = Events.activeUsers(ev, 7).orderBy("day")
      .as[(Long, Long, Long, Option[Double], Long, Long)].collect().toSeq
    assert(r == Seq(
      (10L, 2L, 2L, Some(1.0), 2L, 2L),
      (11L, 1L, 2L, Some(0.5), 0L, 2L),
      (12L, 0L, 2L, Some(0.0), 0L, 2L),
      (13L, 1L, 3L, Some(0.333333333), 1L, 3L)))
  }

  test("activeUsers: trailing 2-day window slides off old users; " +
      "partitioning-invariant") {
    val r = Events.activeUsers(ev, 2).orderBy("day")
      .as[(Long, Long, Long, Option[Double], Long, Long)].collect().toSeq
    assert(r.map(t => (t._1, t._3)) ==
      Seq((10L, 2L), (11L, 2L), (12L, 1L), (13L, 1L)))
    val rp = Events.activeUsers(ev.repartition(5), 2).orderBy("day")
      .as[(Long, Long, Long, Option[Double], Long, Long)].collect().toSeq
    assert(rp == r)
  }
}
