package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PairsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 2

  private def seqDf = Seq(
    // order 1: items at pos 0..4 (0 = UNK at pos 2)
    (1L, 0, 5), (1L, 1, 7), (1L, 2, 0), (1L, 3, 9), (1L, 4, 5),
    // order 2: single item — no pairs
    (2L, 0, 3)
  ).toDF("order_id", "pos", "item")

  test("A9: window band, no self, no UNK pairs, symmetric") {
    val p = Pairs.skipGramPairs(seqDf, W).collect()
    assert(p.forall(r => math.abs(r.getInt(1) - r.getInt(2)) <= W))
    assert(p.forall(r => r.getInt(1) != r.getInt(2)))
    assert(p.forall(r => r.getInt(3) != 0 && r.getInt(4) != 0))
    // symmetry: (t@i, c@j) present iff (t@j, c@i) present
    val set = p.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(set.forall { case (o, i, j) => set.contains((o, j, i)) })
    // order 2 contributes nothing
    assert(p.forall(_.getLong(0) == 1L))
  }

  test("A9: per-item pair count bounded by 2W") {
    val c = Pairs.skipGramPairs(seqDf, W)
      .groupBy("order_id", "pos_t").count().collect()
    assert(c.forall(_.getLong(2) <= 2L * W))
  }

  test("A9: zero-shuffle basket variant emits the identical pair multiset") {
    val baskets = seqDf.groupBy("order_id")
      .agg(array_sort(collect_list(struct($"pos", $"item")))
        .getField("item").as("basket"))
    val a = Pairs.skipGramPairsFromBaskets(baskets, W)
      .select("order_id", "pos_t", "pos_c", "target", "context")
    val b = Pairs.skipGramPairs(seqDf, W)
      .select("order_id", "pos_t", "pos_c", "target", "context")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("A9 on fixtures: relational == zero-shuffle variant") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val vocab = Vocab.withIndex(Vocab.topK(li, "l_partkey", 100))
    val enc = Vocab.encode(li, "l_partkey", vocab)
    val seqd = Pairs.positions(enc, "l_orderkey", "idx",
      Seq(Portable.seededHash($"l_orderkey", $"l_linenumber", $"l_partkey"),
        $"l_partkey"), 50)
    val baskets = seqd.groupBy($"order_id")
      .agg(array_sort(collect_list(struct($"pos", $"item")))
        .getField("item").as("basket"))
    val a = Pairs.skipGramPairsFromBaskets(baskets, 4)
      .select("order_id", "pos_t", "pos_c", "target", "context")
    val b = Pairs.skipGramPairs(seqd, 4)
      .select("order_id", "pos_t", "pos_c", "target", "context")
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("salting: two-stage salted count == direct groupBy on the real pair stream") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val vocab = Vocab.withIndex(Vocab.topK(li, "l_partkey", 100))
    val enc = Vocab.encode(li, "l_partkey", vocab)
    val baskets = Pairs.orderedBaskets(enc, "l_orderkey", "idx",
      Seq(Portable.seededHash($"l_orderkey", $"l_linenumber", $"l_partkey"),
        $"l_partkey"), 50)
    val pairs = Pairs.skipGramPairsFromBaskets(baskets, 4)
    val direct = pairs.groupBy($"target", $"context")
      .agg(count(lit(1)).as("cnt"))
      .as[(Int, Int, Long)].collect().toSet
    // salt keyed on row identity — deterministic placement, result
    // invariant in the salt count
    Seq(1, 8).foreach { salts =>
      val salted = Pairs.saltedCounts(pairs, Seq("target", "context"),
        Seq($"order_id", $"pos_t", $"pos_c"), salts)
        .as[(Int, Int, Long)].collect().toSet
      assert(salted == direct, s"salted($salts) diverged from direct groupBy")
    }
  }

  test("A8: keep-prob rises with rank — frequent (low idx) items subsampled") {
    val t = Pairs.samplingTable(spark, 100).orderBy("idx").collect()
    assert(t.head.getDouble(1) == 0.0) // UNK never sampled
    val probs = t.tail.map(_.getDouble(1))
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    assert(probs.sliding(2).forall { case Array(a, b) => b >= a - 1e-12 })
  }

  test("A10: negatives in range, exactly numNs per pair, deterministic") {
    val pairs = Pairs.skipGramPairs(seqDf, W)
    val n1 = Pairs.negatives(pairs, 4, 100)
    val rows = n1.select("negatives").as[Seq[Int]].collect()
    assert(rows.forall(_.length == 4))
    assert(rows.flatten.forall(k => k >= 0 && k < 100))
    val n2 = Pairs.negatives(pairs, 4, 100).select("negatives")
      .as[Seq[Int]].collect()
    assert(rows.toSeq == n2.toSeq) // keyed-hash → reproducible
  }

  test("A10: negatives skew toward small (frequent) indices — log-uniform") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val vocab = Vocab.withIndex(Vocab.topK(li, "l_partkey", 100))
    val enc = Vocab.encode(li, "l_partkey", vocab)
    val seqd = Pairs.positions(enc, "l_orderkey", "idx",
      Seq(Portable.seededHash($"l_orderkey", $"l_linenumber", $"l_partkey"),
        $"l_partkey"), 50)
    val negs = Pairs.negatives(Pairs.skipGramPairs(seqd, 4), 4, 100)
      .select(explode($"negatives").as("neg"))
    val lowHalf = negs.filter($"neg" < 10).count().toDouble
    val total = negs.count().toDouble
    // P(neg < 10) under log-uniform = ln(11)/ln(101) ≈ 0.52; uniform would be 0.1
    assert(lowHalf / total > 0.4, s"log-uniform skew missing: ${lowHalf / total}")
  }

  test("A11: tensor assembly shapes (contexts = 1+numNs, labels = [1,0...])") {
    val pairs = Pairs.skipGramPairs(seqDf, W)
    val asm = Pairs.assemble(Pairs.negatives(pairs, 4, 100), 4)
    val r = asm.select("contexts", "labels").collect()
    assert(r.forall(_.getSeq[Int](0).length == 5))
    assert(r.forall(_.getSeq[Int](1) == Seq(1, 0, 0, 0, 0)))
  }

  test("associationRules: hand-counted support/confidence/lift; " +
      "duplicate items in a transaction count once; floor applies") {
    val txns = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 10L), (2L, 20L),   // item 10 twice: counts once
      (3L, 10L)
    ).toDF("order_id", "item")
    val got = Pairs.associationRules(txns, "order_id", "item", 2L)
      .orderBy("antecedent", "consequent")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // only {10,20} co-present twice; N=3, c_10=3, c_20=2
    assert(got == Seq(
      (10L, 20L, 3L, 3L, 2L, 2L, 0.666666667, 0.666666667, 1.0),
      (20L, 10L, 3L, 2L, 3L, 2L, 0.666666667, 1.0, 1.0)))
    // lift > 1 when the pair beats popularity-coincidence
    val aff = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 9L))
      .toDF("order_id", "item")
    val lifted = Pairs.associationRules(aff, "order_id", "item", 2L)
      .select("lift").as[Double].collect()
    assert(lifted.forall(_ == 1.5))
  }

  test("associationRules: direction matters — confidence asymmetric " +
      "on an asymmetric basket set; partitioning-invariant") {
    // 20 appears only with 10; 10 appears in many baskets alone
    val txns = (Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)) ++
      (3L to 10L).map(o => (o, 10L))).toDF("order_id", "item")
    val got = Pairs.associationRules(txns, "order_id", "item", 2L)
      .select("antecedent", "confidence").as[(Long, Double)]
      .collect().toMap
    assert(got(20L) == 1.0, "20 -> 10 is certain")
    assert(got(10L) == 0.2, "10 -> 20 is rare")
    val rep = Pairs.associationRules(txns.repartition(7), "order_id",
      "item", 2L).select("antecedent", "confidence")
      .as[(Long, Double)].collect().toMap
    assert(rep == got)
  }
}
