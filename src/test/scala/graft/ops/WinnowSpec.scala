package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  private def fps(df: org.apache.spark.sql.DataFrame) =
    Text.winnowFingerprints(df, "doc_id", "text", K, W)

  test("winnowFingerprints: the SWA guarantee — a shared token run of " +
      "length >= w+k-1 yields a common fingerprint; density bounded " +
      "by the window-start count") {
    // shared run of exactly w+k-1 = 6 tokens inside unrelated noise
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two three four $shared five six seven eight"),
      (2L, s"p q r s t u v $shared w x y z")).toDF("doc_id", "text")
    val f = fps(df)
    val common = f.groupBy("fp").agg(countDistinct("doc_id").as("d"))
      .filter(col("d") === 2).count()
    assert(common >= 1, "guarantee: >= 1 common fingerprint")
    // density: per doc, #fps <= #window starts = P - w + 1
    val counts = f.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      .as[(Long, Long)].collect().toMap
    val toks1 = df.filter(col("doc_id") === 1)
      .select(size(split(col("text"), " "))).as[Int].head()
    assert(counts(1L) <= toks1 - K + 1 - W + 1)
  }

  test("winnowFingerprints: doc with fewer than w grams winnows ONE " +
      "full-span window = the min gram hash; < k tokens -> no rows") {
    // 4 tokens -> P = 2 grams < w: single fingerprint, the min hash
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val f = fps(df).as[(Long, Long)].collect().toSeq
    assert(f.map(_._1).distinct == Seq(1L), "doc 2 (< k tokens) absent")
    assert(f.size == 1)
    val expected = df.filter(col("doc_id") === 1)
      .select(explode(Text.shinglesAll(Text.tokens(col("text")), K)))
      .select(Portable.seededHash(col("col")))
      .as[Long].collect().min
    assert(f.head._2 == expected)
  }

  test("winnowFingerprints: identical docs get identical sets; " +
      "partitioning-invariant") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, t), (2L, t), (3L, "totally different words here " +
      "nothing shared with anyone else at all")).toDF("doc_id", "text")
    val f = fps(df)
    val s1 = f.filter(col("doc_id") === 1).select("fp").as[Long].collect().toSet
    val s2 = f.filter(col("doc_id") === 2).select("fp").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    val fp7 = fps(df.repartition(7)).orderBy("doc_id", "fp")
      .as[(Long, Long)].collect().toSeq
    assert(fp7 == f.orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq)
  }

  test("winnowOverlap: shared-run pair reported with containment <= 1; " +
      "a boilerplate fingerprint above maxDf is pruned from sizes " +
      "and intersections") {
    val boiler = "common header line every page repeats verbatim always"
    val df = Seq(
      (1L, s"$boiler unique one text body alpha beta gamma delta"),
      (2L, s"$boiler unique two text body alpha beta gamma delta"),
      (3L, s"$boiler completely other content nothing else matches xyz"),
      (4L, s"$boiler yet more unrelated filler tokens qrs tuv wxy"))
      .toDF("doc_id", "text")
    val f = fps(df)
    val all = Text.winnowOverlap(f, "doc_id", maxDf = 100L, minShared = 1L)
    val pruned = Text.winnowOverlap(f, "doc_id", maxDf = 3L, minShared = 1L)
    val a12 = all.filter(col("id_a") === 1 && col("id_b") === 2)
      .select("n_shared").as[Long].collect().head
    assert(a12 >= 1)
    assert(all.filter(col("containment") > 1.0).count() == 0)
    // fingerprints common to all 4 docs (the boilerplate run) exceed
    // maxDf=3 -> pruned: every pair's shared count can only shrink
    val allM = all.select("id_a", "id_b", "n_shared")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val prM = pruned.select("id_a", "id_b", "n_shared")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(prM.keySet.subsetOf(allM.keySet))
    prM.foreach { case (k, v) => assert(v <= allM(k)) }
    // the all-4-docs boilerplate fingerprints are gone from pruned:
    // the pruned (3,4) intersection equals EXACTLY their shared
    // fingerprints with df <= maxDf (not the value-level "looks like
    // boilerplate" set — winnowing selects per context, so a
    // boilerplate gram picked in only two docs legitimately survives)
    val dfCounts = f.groupBy("fp").agg(countDistinct("doc_id").as("d"))
    assert(dfCounts.filter(col("d") === 4).count() >= 1,
      "fixture really has a > maxDf fingerprint")
    val expected34 = f.filter(col("doc_id").isin(3L, 4L))
      .join(dfCounts.filter(col("d") <= 3).select("fp"), Seq("fp"))
      .groupBy("fp").agg(countDistinct("doc_id").as("both"))
      .filter(col("both") === 2).count()
    assert(prM.getOrElse((3L, 4L), 0L) == expected34)
    assert(expected34 < allM((3L, 4L)),
      "pruning really removed df=4 fingerprints from the (3,4) pair")
  }
}
