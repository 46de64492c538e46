package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecEvalSpec extends SparkSpec {
  import spark.implicits._

  private def baskets(rows: (Long, Seq[Int])*) =
    rows.toDF("order_id", "basket")

  private def cooc(rows: (Int, Int, Long)*) =
    rows.toDF("target", "context", "cnt")

  test("heldoutRanks: co-occurrence mass ranks the held-out item; " +
      "in-cart candidates are excluded from the ranking") {
    val b = baskets(100L -> Seq(1, 2, 3))
    // model: 3 co-occurs with both context items; 2 co-occurs with 1
    // strongly (but 2 is IN the cart — must not occupy a rank)
    val m = cooc((1, 3, 5L), (2, 3, 7L), (1, 2, 99L), (1, 4, 6L))
    val r = RecEval.heldoutRanks(b, m).as[(Long, Int)].collect().toMap
    // candidates: 3 (score 12), 4 (score 6) — 2 excluded despite 99
    assert(r(100L) == 1)
    // weaken the model below a competitor: heldout drops to rank 2
    val m2 = cooc((1, 3, 5L), (1, 4, 6L))
    assert(RecEval.heldoutRanks(b, m2)
      .as[(Long, Int)].collect().toMap.apply(100L) == 2)
  }

  test("hitRateCurve: planted signal is detected; unrankable held-outs " +
      "stay in the denominator; singleton baskets are ineligible") {
    val b = baskets(
      1L -> Seq(1, 2, 3),   // heldout 3, rankable at 1
      2L -> Seq(1, 2, 9),   // heldout 9, model never scores it
      3L -> Seq(7))         // singleton — ineligible
    val m = cooc((1, 3, 5L), (2, 3, 7L), (1, 4, 1L))
    val curve = RecEval.hitRateCurve(b, m, 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(curve.forall(_._2 == 2L)) // orders 1 and 2 eligible
    assert(curve.map(_._3).toSeq == Seq(1L, 1L, 1L)) // only order 1 hits
    assert(curve.head._4 == 0.5)
    // monotone: hit-rate@k never decreases in k
    assert(curve.map(_._4).toSeq == curve.map(_._4).sorted.toSeq)
  }

  test("rankMetrics: rank-1 hit yields MRR = NDCG = 1/n; the discount " +
      "tables are the exact shared-literal integers") {
    val b = baskets(1L -> Seq(1, 2, 3), 2L -> Seq(1, 2, 9))
    val m = cooc((1, 3, 5L), (2, 3, 7L), (1, 4, 1L))
    val (k, n, nr, mrr, ndcg) = RecEval.rankMetrics(b, m, 3)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(k == 3L && n == 2L)
    assert(nr == 1L) // order 2's heldout never scored
    // order 1 hits at rank 1: mrr = ndcg = 1e9/1e9 / 2 orders = 0.5
    assert(mrr == 0.5 && ndcg == 0.5)
    // table sanity: rr halves, dcg discounts via log2(r+1)
    assert(RecEval.rrTable(3) == Seq(1000000000L, 500000000L, 333333333L))
    assert(RecEval.dcgTable(3).head == 1000000000L)
    assert(RecEval.dcgTable(3)(1) ==
      math.floor(1e9 / (math.log(3.0) / math.log(2.0)) + 0.5).toLong)
  }

  test("rrfFuse: integer weights 1e9 div (c+r); presence in both lists " +
      "beats a single better rank; doc_id breaks exact ties") {
    def w(r: Long) = 1000000000L / (60L + r)
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rnk")
    val got = RecEval.rrfFuse(Seq(lex, sem), c = 60, k = 10)
      .orderBy("rnk")
      .select("doc_id", "n_lists", "rrf_i").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 11: ranks 2+1 in two lists — beats doc 10's single rank-1
    assert(got == Seq(
      (11L, 2L, w(2) + w(1)),
      (10L, 1L, w(1)),
      (13L, 1L, w(2)),
      (12L, 1L, w(3))))
    // 12 vs 13 differ; make an exact tie and check the id tiebreak:
    val t1 = Seq((7L, 5L, 4L)).toDF("query_id", "doc_id", "rnk")
    val t2 = Seq((7L, 3L, 4L)).toDF("query_id", "doc_id", "rnk")
    val tie = RecEval.rrfFuse(Seq(t1, t2), 60, 10)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    assert(tie == Seq(3L, 5L))
  }

  test("rrfFuse: k bounds the fused list per query; queries fuse " +
      "independently") {
    val a = (1L to 8L).map(r => (1L, 100L + r, r))
      .toDF("query_id", "doc_id", "rnk")
    val b = (1L to 8L).map(r => (2L, 200L + r, r))
      .toDF("query_id", "doc_id", "rnk")
    val got = RecEval.rrfFuse(Seq(a, b), 60, 3)
      .select("query_id", "rnk", "doc_id").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 1L, 101L), (1L, 2L, 102L), (1L, 3L, 103L),
      (2L, 1L, 201L), (2L, 2L, 202L), (2L, 3L, 203L)))
  }

  test("rboAtDepth: identical / swapped-tail / disjoint rankings by " +
      "hand at d=3, p=0.5; empty-intersection probes kept at 0") {
    // w9 = [500000000, 125000000, 41666667]; W9 = [666666667,
    // 166666667, 41666667]; identical max = 875000001
    assert(RecEval.rboSuffixW9(3, 0.5) ==
      Seq(666666667L, 166666667L, 41666667L))
    def rk(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("probe_id", "vec_id", "rnk")
    val a = rk((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L), (3L, 30L, 3L))
    val b = rk(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), // identical
      (2L, 10L, 1L), (2L, 30L, 2L), (2L, 20L, 3L), // tail swapped
      (3L, 40L, 1L), (3L, 50L, 2L), (3L, 60L, 3L)) // disjoint
    val r = RecEval.rboAtDepth(a, b, "probe_id", "vec_id", "rnk", 3, 0.5)
      .orderBy("probe_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 0.875000001, 1.0),
      (2L, 3L, 0.750000001, 0.857142857),
      (3L, 0L, 0.0, 0.0)))
  }
}
