package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property laws for the text-scrub/repetition
  * operators: PII masking must be idempotent (placeholders never
  * re-match a pattern — the guarantee that lets a pipeline re-run the
  * scrub safely), masked output must carry no residual matches, and
  * the repetition ratios must satisfy their algebraic invariants on
  * arbitrary token streams. Generators are driven by a fixed-seed
  * loop (the scalatestplus bridge isn't available offline). */
class TextLawsSpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 10

  /** Fragments a crawled document plausibly interleaves: words, PII of
    * each kind (some adversarially adjacent), digit runs both below and
    * above the masking threshold. */
  private val fragmentGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "data", "spark", "join", "alpha", "beta"),
    Gen.chooseNum(1, 3).map(i => s"user$i@host$i.example.org"),
    Gen.chooseNum(1, 3).map(i => s"https://ex$i.org/p/q?id=$i"),
    Gen.chooseNum(100000L, 999999L).map(_.toString),          // 6 digits: kept
    Gen.chooseNum(1000000L, 99999999L).map(_.toString),      // 7-8: masked
    Gen.chooseNum(100, 999).map(a => s"$a-555-0199"),        // phone, dash form
    Gen.chooseNum(100, 999).map(a => s"$a.555.0142"),        // phone, dot form
    Gen.chooseNum(0, 255).map(o => s"10.$o.0.7"),            // IPv4
    Gen.const("1.2.3"),                                      // not an IP (3 groups)
    Gen.const("555-12-0199"),                                // not a phone (2-digit mid)
    Gen.const("a@b"),                                        // not an email (no TLD)
    Gen.const("http:/almost.a.url"))                         // not a URL (one slash)

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, fragmentGen))
      .map(_.mkString(" "))

  private def docs(seed: Int): Seq[String] =
    (1 to Cases).map(i =>
      docGen(Gen.Parameters.default, Seed(seed.toLong * 1000 + i))
        .getOrElse("the data"))

  test("maskPii law: idempotent, and masked text carries no residual matches") {
    val df = docs(7).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Text.maskPii(df, "text")
      .select($"doc_id", $"masked".as("text"))
    val twice = Text.maskPii(once, "text")
    val rows = once.select($"doc_id", $"text")
      .join(twice.select($"doc_id", $"masked", $"n_urls", $"n_emails",
        $"n_phones", $"n_ips", $"n_long_nums"), Seq("doc_id"))
      .as[(Long, String, String, Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, m1, m2, u, e, p, ip, n) =>
      assert(m1 == m2, s"doc $id not idempotent:\n$m1\n$m2")
      assert((u, e, p, ip, n) == ((0L, 0L, 0L, 0L, 0L)),
        s"doc $id residual matches after masking: " +
          s"urls=$u emails=$e phones=$p ips=$ip nums=$n\n$m1")
    }
  }

  test("repetitionStats laws: ratio ranges and count identities on random docs") {
    for (n <- Seq(1, 2, 3)) {
      val df = docs(n).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = Text.repetitionStats(df, "text", n)
        .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
      assert(rows.length == Cases)
      rows.foreach { case (id, total, distinct, dup, top) =>
        assert(distinct <= total, s"doc $id: distinct $distinct > total $total")
        assert((total == 0) == dup.isEmpty && (total == 0) == top.isEmpty,
          s"doc $id: NULL ratios must appear exactly when no n-grams exist")
        dup.foreach { d =>
          assert(d >= 0.0 && d < 1.0, s"doc $id: dup ratio $d")
          // algebraic identity with the counts it derives from
          assert(math.abs(d - (1.0 - distinct.toDouble / total)) < 1e-9)
        }
        top.foreach(t =>
          assert(t > 0.0 && t <= 1.0, s"doc $id: top ratio $t"))
        // a doc with all-distinct n-grams has dup 0; fully degenerate has top 1
        if (total > 0 && distinct == total) assert(dup.contains(0.0))
        if (total > 0 && distinct == 1L) assert(top.contains(1.0))
      }
    }
  }

  test("blocklistStats laws: count bounds, and scrubbing listed tokens zeroes the report") {
    val terms = Seq("data", "join", "alpha")
    val df = docs(13).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = Text.blocklistStats(df, "text", terms)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
    assert(rows.length == Cases)
    rows.foreach { case (id, nTok, nBlk, nTyp, ratio) =>
      assert(nBlk <= nTok && nTyp <= nBlk, s"doc $id: $nTok/$nBlk/$nTyp")
      assert(nTyp <= terms.length, s"doc $id: types $nTyp > |terms|")
      ratio.foreach(r => assert(r >= 0.0 && r <= 1.0))
      assert(ratio.isDefined == (nTok > 0))
    }
    // the scrub operator zeroes the report, and its removal count
    // matches the report's hit count per document
    val reported = rows.map(r => r._1 -> r._3).toMap
    val scrubbed = Text.blocklistScrub(df, "text", terms)
    scrubbed.as[(Long, String, Long)].collect().foreach {
      case (id, _, nRemoved) =>
        assert(nRemoved == reported(id), s"doc $id removed $nRemoved")
    }
    Text.blocklistStats(scrubbed.drop("n_removed"), "text", terms)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .foreach { case (id, _, nBlk, nTyp, _) =>
        assert(nBlk == 0 && nTyp == 0, s"doc $id still reports hits")
      }
  }

  test("ictPairs law: splicing the query back at span_start rebuilds every doc") {
    val df = docs(19).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val k = 3
    val pairs = Text.ictPairs(df, "doc_id", "text", k)
      .as[(Long, Long, Long, String, String)].collect()
    val original = df.as[(Long, String)].collect().toMap
    pairs.foreach { case (id, n, a, q, p) =>
      val toks = original(id).split(" ", -1)
      assert(n == toks.length && a >= 0 && a <= n - k, s"doc $id span")
      val qt = q.split(" ", -1); val pt = p.split(" ", -1)
      assert(qt.length == k, s"doc $id query len ${qt.length}")
      val rebuilt = (pt.take(a.toInt) ++ qt ++ pt.drop(a.toInt))
        .mkString(" ")
      assert(rebuilt == original(id), s"doc $id not rebuilt")
    }
    // only long-enough docs produce a pair
    assert(pairs.length ==
      original.values.count(_.split(" ", -1).length >= 2 * k))
  }

  test("chunkContentDefined law: chunks partition the token stream on arbitrary docs") {
    val df = docs(23).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunks = Text.chunkContentDefined(df, "text", divisor = 4,
        salt = "law")
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    val original = df.as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // contiguous 0-based chunk indices, token counts consistent
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { c =>
        assert(c._3 == c._4.split(" ", -1).length, s"doc $id count")
      }
      // concatenating chunks in order rebuilds the document exactly
      assert(sorted.map(_._4).mkString(" ") == original(id), s"doc $id")
    }
    // every doc (split(' ') is never empty) emits at least one chunk
    assert(chunks.map(_._1).distinct.length == original.size)
  }
}
