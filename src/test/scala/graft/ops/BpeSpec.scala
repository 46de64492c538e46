package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordCounts: corpus collapses to the (word, count) frame") {
    val docs = Seq((1L, "ab ab ba"), (2L, "ab cc")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("ab" -> 3L, "ba" -> 1L, "cc" -> 1L))
  }

  test("learn: deterministic merges with count-then-lexicographic tiebreak") {
    // "abab" x3: pairs (a,b)x2 per word -> c=6 dominates; after merging,
    // (ab,ab) c=3 wins round 2; "cd" x2 gives (c,d) c=2 for round 3
    val wc = Seq(("abab", 3L), ("cd", 2L)).toDF("word", "count")
    val learned = Bpe.learn(wc, 4)
    val m = learned.merges
      .as[(Long, String, String, String, Long)].collect().toList
    assert(m == List(
      (1L, "a", "b", "ab", 6L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "c", "d", "cd", 2L)))            // exhausted after 3 (no pairs left)
    val seg = learned.vocab.select("word", "symbols")
      .as[(String, Seq[String])].collect().toMap
    assert(seg("abab") == Seq("abab") && seg("cd") == Seq("cd"))
  }

  test("learn: identical-symbol runs merge leftmost non-overlapping pairs") {
    // "aaa" x2: (a,a) c=4 (two per word); greedy leaves [aa, a]
    val wc = Seq(("aaa", 2L)).toDF("word", "count")
    val learned = Bpe.learn(wc, 1)
    val m = learned.merges
      .as[(Long, String, String, String, Long)].collect().toList
    assert(m == List((1L, "a", "a", "aa", 4L)))
    val seg = learned.vocab.select("symbols")
      .as[Seq[String]].collect().head
    assert(seg == Seq("aa", "a"))
  }

  test("learn law: every segmentation concatenates back to its word; counts preserved") {
    // merging only ever concatenates adjacent symbols, so at any round
    // concat(symbols) == word and no word row is lost or duplicated
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text")
    val learned = Bpe.learn(wc, 5)
    val bad = learned.vocab
      .filter(concat_ws("", col("symbols")) =!= col("word")).count()
    assert(bad == 0L)
    val before = wc.as[(String, Long)].collect().toMap
    val after = learned.vocab.select("word", "count")
      .as[(String, Long)].collect().toMap
    assert(after == before)
    // exactly 5 merges learned on a real corpus, ranks 1..5, counts
    // non-increasing (a later merge can never beat an earlier one)
    val m = learned.merges
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(m.map(_._1).toList == List(1L, 2L, 3L, 4L, 5L))
    assert(m.sliding(2).forall { case Array(a, b) => b._5 <= a._5 })
  }

  test("learn batched law: batch > 1 is bit-identical to sequential on a " +
      "real corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text")
    def learn(batch: Int) = Bpe.learn(wc, 8, batch = batch)
    def table(l: Bpe.Learned) = l.merges
      .as[(Long, String, String, String, Long)].collect().toList.sortBy(_._1)
    val base = learn(1)
    val seq1 = table(base)
    assert(seq1.length == 8 && base.rounds == 8)
    val b4 = learn(4)
    val b8 = learn(8)
    assert(table(b4) == seq1)
    assert(table(b8) == seq1)
    // the batching must actually batch on real Zipfian counts — fewer
    // driver round-trips, not just equal output
    assert(b4.rounds < 8 && b8.rounds <= b4.rounds)
  }

  test("learn batched: conflict/tie fixtures degrade to sequential, never " +
      "to a wrong table") {
    // "abab": round-2 winner (ab,ab) is CREATED by round 1 — the guard
    // must not batch past it (trigram (a,b,a)/(b,a,b) ceilings block).
    val chain = Seq(("abab", 3L), ("cd", 2L)).toDF("word", "count")
    def m(df: org.apache.spark.sql.DataFrame, n: Int, b: Int) =
      Bpe.learn(df, n, batch = b).merges
        .as[(Long, String, String, String, Long)].collect().toList
    assert(m(chain, 4, 4) == m(chain, 4, 1))
    assert(m(chain, 4, 4) == List(
      (1L, "a", "b", "ab", 6L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "c", "d", "cd", 2L)))
    // flat tie: (a,b) and (c,d) both c=2 and disjoint — batching may
    // take both in one round; sequential resolves the tie by (l, r)
    // order, which is exactly the batch's prefix order, so the tables
    // agree either way
    val tie = Seq(("ab", 2L), ("cd", 2L)).toDF("word", "count")
    assert(m(tie, 2, 2) == m(tie, 2, 1))
    // disjoint with a count gap: both accepted in ONE round, same table
    val gap = Seq(("ab", 9L), ("cd", 2L)).toDF("word", "count")
    assert(m(gap, 2, 2) == m(gap, 2, 1))
    assert(m(gap, 2, 2) == List(
      (1L, "a", "b", "ab", 9L), (2L, "c", "d", "cd", 2L)))
    assert(Bpe.learn(gap, 2, batch = 2).rounds == 1)
  }

  test("encode: dictionary join reassembles subwords in word order; OOV falls back to chars") {
    val wc = Seq(("abab", 2L), ("ab", 1L)).toDF("word", "count")
    val learned = Bpe.learn(wc, 2)   // (a,b)->ab, (ab,ab)->abab
    val docs = Seq(
      (1L, "abab ab abab"),
      (2L, "xy ab")                  // "xy" is OOV -> chars x y
    ).toDF("doc_id", "text")
    val r = Bpe.encode(docs, "text", learned.vocab)
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((3L, 3L, "abab ab abab")))
    assert(r(2L) == ((2L, 3L, "x y ab")))
  }

  test("fertility: per-slice rollup; OOV chars fallback; wordless docs drop") {
    val vocab = Seq(
      ("abab", 1L, Seq("ab", "ab")),
      ("cd", 1L, Seq("cd"))
    ).toDF("word", "count", "symbols")
    val docs = Seq(
      (1L, "abab cd", "s1"),
      (2L, "abab xyz", "s2"),      // xyz OOV -> 3 char tokens
      (3L, "", "s3")               // no words -> no s3 row, doc uncounted
    ).toDF("doc_id", "text", "source")
    val r = Bpe.fertility(docs, "text", vocab, Seq("source"))
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    assert(r("s1") == (("s1", 1L, 2L, 3L, 6L, 1.5, 2.0)))
    assert(r("s2") == (("s2", 1L, 2L, 5L, 7L, 2.5, 1.4)))
    assert(!r.contains("s3"))
  }

  test("fertility law: self-trained vocab means zero OOV — token totals match encode") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val learned = Bpe.learn(Bpe.wordCounts(docs, "text"), 4)
    val fert = Bpe.fertility(docs, "text", learned.vocab, Seq("source"))
    val totalFert = fert.agg(sum("n_tokens")).as[Long].collect().head
    val totalEnc = Bpe.encode(docs, "text", learned.vocab)
      .agg(sum("n_bpe_tokens")).as[Long].collect().head
    assert(totalFert == totalEnc)
    // fertility is bounded by chars-per-word (char split is the floor
    // segmentation) and at least 1 (a word is at least one token)
    val bad = fert.filter(col("fertility") < 1.0 ||
      col("chars_per_token") < 1.0).count()
    assert(bad == 0L)
  }
}
