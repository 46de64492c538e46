package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  // words: aaab x2, ab x1, b x1 — counts chosen so minCount=2 prunes
  // the initial "ab" but keeps the continuation "ab"
  private def wc = Seq(("aaab", 2L), ("ab", 1L), ("b", 1L))
    .toDF("word", "count")

  test("wordpieceVocab: position-aware pieces pruned at minCount; " +
      "single chars always survive (totality)") {
    val v = Bpe.wordpieceVocab(wc, 3, 2L)
      .as[(String, Boolean)].collect().toSet
    assert(v == Set(
      ("a", true), ("aa", true), ("aaa", true), ("b", true),
      ("a", false), ("aa", false), ("aab", false), ("ab", false),
      ("b", false)))
  }

  test("wordpieceSegment: greedy longest-match with the ## rule; " +
      "pruned initial piece falls back to the shorter match; " +
      "concatenation law; partitioning-invariant") {
    val v = Bpe.wordpieceVocab(wc, 3, 2L)
    val seg = Bpe.wordpieceSegment(wc, v, 3)
      .as[(String, Long, Seq[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(seg("aaab") == ((2L, Seq("aaa", "##b"))))
    // initial "ab" was pruned (count 1 < 2) -> greedy takes "a"
    assert(seg("ab") == ((1L, Seq("a", "##b"))))
    assert(seg("b") == ((1L, Seq("b"))))
    // concatenation law: stripping ## and joining rebuilds the word
    seg.foreach { case (w, (_, ps)) =>
      assert(ps.map(_.stripPrefix("##")).mkString == w)
    }
    val segP = Bpe.wordpieceSegment(wc.repartition(5), v, 3)
      .as[(String, Long, Seq[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(segP == seg)
  }

  test("wordpieceSegment: minCount=1 keeps whole words as single " +
      "initial pieces when they fit maxPiece") {
    val v = Bpe.wordpieceVocab(wc, 4, 1L)
    val seg = Bpe.wordpieceSegment(wc, v, 4)
      .as[(String, Long, Seq[String])].collect()
      .map(t => t._1 -> t._3).toMap
    assert(seg("aaab") == Seq("aaab"))
    assert(seg("ab") == Seq("ab"))
  }
}
