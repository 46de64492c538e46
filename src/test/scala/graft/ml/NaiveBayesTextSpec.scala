package graft.ml

import graft.SparkSpec
import graft.ops.Sources
import org.apache.spark.sql.functions._

class NaiveBayesTextSpec extends SparkSpec {
  import spark.implicits._

  // Tiny hand-checkable corpus: two classes, overlapping vocab.
  private lazy val toy = Seq(
    (0L, "en", "the cat sat"),
    (1L, "en", "the dog sat"),
    (2L, "fr", "le chat noir"),
    (3L, "fr", "le chien noir le")
  ).toDF("doc_id", "lang", "text")

  private lazy val model = NaiveBayesText.train(toy, "text", "lang")

  test("train: exact class and token counts") {
    val classes = model.classes.orderBy("label")
      .as[(String, Long, Long)].collect()
    // en: 6 tokens over 2 docs; fr: 7 tokens over 2 docs
    assert(classes.sameElements(Seq(("en", 6L, 2L), ("fr", 7L, 2L))))
    val cnt = model.tokenCounts.as[(String, String, Long)].collect()
      .map { case (l, t, c) => (l, t) -> c }.toMap
    assert(cnt(("en", "the")) == 2 && cnt(("en", "sat")) == 2 &&
      cnt(("fr", "le")) == 3 && cnt(("fr", "noir")) == 2)
    assert(!cnt.contains(("en", "le")))
    val (docsTotal, vocabV) = model.totals.as[(Long, Long)].head()
    assert(docsTotal == 4 && vocabV == 8)
  }

  test("score: matches the hand formula, unseen tokens contribute zero") {
    // doc "the chat": en -> ln(2/4) + 1·ln(2+1) - 2·ln(6+8), all / n_d=2
    val probe = Seq((9L, "the chat")).toDF("doc_id", "text")
    val got = NaiveBayesText.score(model, probe, "doc_id", "text")
      .as[(Long, String, Double)].collect().map(r => r._2 -> r._3).toMap
    val en = (math.log(2.0 / 4) + math.log(3.0) - 2 * math.log(14.0)) / 2
    val fr = (math.log(2.0 / 4) + math.log(2.0) - 2 * math.log(15.0)) / 2
    assert(math.abs(got("en") - en) < 1e-12)
    assert(math.abs(got("fr") - fr) < 1e-12)
  }

  test("classify: argmax with runner-up margin; training docs recovered") {
    val r = NaiveBayesText.classify(model, toy, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Double, Double)].collect()
    assert(r.map(_._2).sameElements(Seq("en", "en", "fr", "fr")))
    assert(r.forall(_._4 > 0), "margin must be top minus runner-up > 0 here")
  }

  test("classify: deterministic tie-break on label ascending") {
    // Symmetric corpus: "x" is equally likely under both classes.
    val sym = Seq((0L, "b", "x"), (1L, "a", "x")).toDF("id", "y", "text")
    val m = NaiveBayesText.train(sym, "text", "y")
    val r = NaiveBayesText.classify(m, Seq((5L, "x")).toDF("id", "text"),
      "id", "text").as[(Long, String, Double, Double)].head()
    assert(r._2 == "a" && math.abs(r._4) < 1e-12)
  }

  test("fixture self-train accuracy beats a majority-class guess") {
    val docs = Sources.table(spark, sf("sf0.001"), "documents")
    val m = NaiveBayesText.train(docs, "text", "lang")
    val pred = NaiveBayesText.classify(m, docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val n = pred.count()
    val hit = pred.filter($"pred_label" === $"lang").count()
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).as[Long].head()
    assert(hit.toDouble / n > majority.toDouble / n,
      s"NB accuracy ${hit}/$n not above majority baseline $majority/$n")
  }

  test("calibration: equal-count margin bins, exact accuracy, total conservation") {
    // margins 10..1 → with 5 bins: bin1={10,9} .. bin5={2,1};
    // correct iff margin > 5 → accuracies 1, 1, (1, 0.5 split), 0, 0
    val scored = (1L to 10L).map(i =>
      (i, (11 - i).toDouble, i <= 5)).toDF("doc_id", "margin", "correct")
    val r = NaiveBayesText.calibration(scored, "doc_id", bins = 5)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(r.map(_._1).toSeq == (1L to 5L))
    assert(r.map(_._2).sum == 10L)               // every doc lands in a bin
    assert(r.forall(_._2 == 2L))                 // equal-count deciles
    assert(r.map(_._3).toSeq == Seq(2L, 2L, 1L, 0L, 0L))
    assert(r.map(_._4).toSeq == Seq(1.0, 1.0, 0.5, 0.0, 0.0))
    // margin ranges are descending and disjoint
    assert(r.sliding(2).forall(p => p(0)._6 >= p(1)._5))
  }

  test("plan: token-count model meets the corpus tf frame via broadcast") {
    val docs = Sources.table(spark, sf("sf0.001"), "documents")
    val m = NaiveBayesText.train(docs, "text", "lang")
    val plan = NaiveBayesText.score(m, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast model join, got:\n$plan")
  }

  test("score (r16 map-only doc length): double spaces collapse out of " +
      "n_d, an empty-text doc never appears — the aggregate-form row " +
      "set, pinned on the edge cases") {
    val train = Seq((1L, "a b", "en"), (2L, "c d", "fr"))
      .toDF("doc_id", "text", "lang")
    val m = NaiveBayesText.train(train, "text", "lang")
    val docs = Seq(
      (10L, "a  b a"),   // double space: 3 tokens, not 4
      (11L, ""),         // no tokens: must be ABSENT from the output
      (12L, " "),        // only empties: absent too
      (13L, "a")
    ).toDF("doc_id", "text")
    val scored = NaiveBayesText.score(m, docs, "doc_id", "text")
    assert(scored.filter(col("doc_id").isin(11L, 12L)).count() == 0)
    // n_d enters avg_logp as the normalizer: replay doc 13 by hand
    // against doc 10 — same seen-token mass per class, different n_d
    val perDoc = scored.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(10L -> 2L, 13L -> 2L)) // one row per class
    // and classify still yields one prediction per surviving doc
    val pred = NaiveBayesText.classify(m, docs, "doc_id", "text")
    assert(pred.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 13L))
  }
}
