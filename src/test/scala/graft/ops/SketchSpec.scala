package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a a a b b c d"),
    (2L, "a b c c c e f g"),
    (3L, "a b h i j k l m")
  ).toDF("doc_id", "text")

  test("cmsTable: cell totals conserve the token mass, per depth row") {
    val sk = Sketch.cmsTable(docs, "text", depth = 3, width = 8, "s")
    // every token occurrence lands in exactly one cell per row
    val perRow = sk.groupBy("r").agg(sum("cnt").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow == Map(0 -> 24L, 1 -> 24L, 2 -> 24L))
    // and the table never exceeds depth x width cells
    assert(sk.count() <= 3L * 8L)
  }

  test("cms one-sided law: estimate >= exact for EVERY token, any geometry") {
    for (width <- Seq(4, 16, 256)) {
      val audit = Sketch.heavyHitterAudit(docs, "text",
        depth = 3, width = width, minCount = 1L, "s")
        .as[(String, Long, Long, Long)].collect()
      assert(audit.length == 13) // 13 distinct tokens, all >= 1
      audit.foreach { case (tok, exact, est, over) =>
        assert(est >= exact, s"$tok: est $est < exact $exact at w=$width")
        assert(over == est - exact)
      }
    }
  }

  test("wide sketch: no collisions -> estimates exact; minCount gates") {
    // width >> distinct tokens: with 13 tokens in 2^16 cells a keyed-hash
    // collision would be a fixture-breaking coincidence
    val audit = Sketch.heavyHitterAudit(docs, "text",
      depth = 3, width = 1 << 16, minCount = 3L, "s")
      .as[(String, Long, Long, Long)].collect()
    val m = audit.map(r => r._1 -> r._2).toMap
    assert(m == Map("a" -> 6L, "b" -> 4L, "c" -> 4L)) // only counts >= 3
    audit.foreach { case (_, exact, est, over) =>
      assert(est == exact && over == 0L)
    }
  }

  test("cms mergeability: shard sketches sum to the corpus sketch (the streaming/backfill law)") {
    val a = docs.filter($"doc_id" <= 1L)
    val b = docs.filter($"doc_id" > 1L)
    val whole = Sketch.cmsTable(docs, "text", 3, 8, "s")
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketch.cmsTable(a, "text", 3, 8, "s")
      .unionByName(Sketch.cmsTable(b, "text", 3, 8, "s"))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("cmsEstimates: unseen candidate token estimates 0 via the missing-cell path") {
    val sk = Sketch.cmsTable(docs, "text", depth = 3, width = 1 << 16, "s")
    val est = Sketch.cmsEstimates(sk, Seq("zzz").toDF("token"), "token",
      depth = 3, width = 1 << 16, "s")
      .as[(String, Long)].collect().toMap
    assert(est == Map("zzz" -> 0L))
  }
}
