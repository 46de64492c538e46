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

  test("hllRegisters: duplicates absorbed by the max; disjoint shards " +
      "merge by pairwise max into exactly the whole-corpus registers") {
    val keyed = docs.withColumn("k", lit("all"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegisters(df, "text", "k", bits = 4, "s")
        .as[(String, Long, Long)].collect()
        .map { case (_, b, r) => b -> r }.toMap
    val whole = regs(keyed)
    // duplicating the corpus changes nothing — COUNT DISTINCT semantics
    assert(regs(keyed.union(keyed)) == whole)
    // shard-compose: registers of doc-1 and docs-2,3 merge by max
    val a = regs(keyed.filter(col("doc_id") === 1))
    val b = regs(keyed.filter(col("doc_id") =!= 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
    // rho stays in the integer-law range for 60-bit hashes
    assert(whole.values.forall(r => r >= 1L && r <= 57L))
  }

  test("hllAudit: estimate positive and within the m=64 error regime " +
      "of the exact distinct; alpha constants are Flajolet's") {
    val keyed = docs.withColumn("k", lit("all"))
    val row = Sketch.hllAudit(keyed, "text", "k", bits = 6, "s")
      .as[(String, Long, Double, Long, Double)].collect().head
    val (_, used, est, exact, err) = row
    assert(exact == 13L) // a..m
    assert(used >= 1L && used <= 64L)
    assert(est > 0.0)
    // raw HLL (no linear-counting correction) at tiny cardinality
    // OVERESTIMATES — the documented small-range bias the audit exists
    // to make visible (est ≈ alpha·m²/V for V mostly-empty registers)
    assert(err > 0.0, s"est=$est exact=$exact err=$err")
    // in the estimator's design regime (n >> m) the error obeys the
    // ~1.04/sqrt(m) law: 2000 distinct tokens vs m=64 → |err| well
    // inside 3 sigma (~39%)
    val big = Seq(("d", (0 until 2000).map(i => s"t$i").mkString(" ")))
      .toDF("k", "text")
    val (_, _, estB, exactB, errB) =
      Sketch.hllAudit(big, "text", "k", bits = 6, "s")
        .as[(String, Long, Double, Long, Double)].collect().head
    assert(exactB == 2000L)
    assert(math.abs(errB) < 39.0, s"est=$estB err=$errB")
    assert(Sketch.hllAlpha(4) == (673L, 1000L))
    assert(Sketch.hllAlpha(6) == (709L, 1000L))
    assert(Sketch.hllAlpha(7) == (7213000L * 128, 10000L * (128000L + 1079L)))
  }

  test("joinSizeExact: hand-counted cross and self joins; null keys " +
      "never join") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None).map(Tuple1(_))
      .toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).map(Tuple1(_)).toDF("k")
    val ab = Sketch.joinSizeExact(a, b, "k")
      .as[(Long, Long, Long)].collect().head
    // 1: 2x1, 2: 1x2 -> 4; null key excluded from n_left too? count(col)
    // skips nulls: n_left = 3
    assert(ab == ((3L, 4L, 4L)))
    val self = Sketch.joinSizeExact(b, b, "k")
      .as[(Long, Long, Long)].collect().head
    assert(self == ((4L, 4L, 1L + 4L + 1L)))
  }

  test("joinSizeEstimate: CMS inner product never underestimates; " +
      "per-row sketch mass equals the row count") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val exact = Sketch.joinSizeExact(li, li, "l_orderkey")
      .select("join_size").as[Long].collect().head
    val n = li.count()
    for (w <- Seq(16, 256)) {
      val cms = Sketch.cmsTableKeyed(li, "l_orderkey", 4, w, "s")
      // each depth row holds every key occurrence exactly once
      val mass = cms.groupBy("r").agg(sum("cnt").as("m"))
        .select("m").as[Long].collect()
      assert(mass.length == 4 && mass.forall(_ == n))
      val est = Sketch.joinSizeEstimate(cms, cms)
        .as[Long].collect().head
      assert(est >= exact, s"width $w: est $est < exact $exact")
    }
  }
}
