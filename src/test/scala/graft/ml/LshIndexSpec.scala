package graft.ml

import graft.SparkSpec
import graft.ops.Sources
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the sleepy dog"),
    (4L, "completely different content about spark engines running fast")
  ).toDF("doc_id", "text")

  test("MinHashLSH near-dup join finds exact+near pairs, skips distinct") {
    val sh = LshIndex.shingleVectors(docs, "text", 3)
    val pairs = LshIndex.minhashNearDup(sh, "doc_id", numTables = 5,
        maxDist = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("BRP-LSH ANN returns k nearest by euclidean distance") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val probe = emb.filter($"vec_id" === 0)
      .select("embedding").as[Seq[Float]].head().toArray
    val nn = LshIndex.euclideanAnn(emb.filter($"vec_id" =!= 0), "vec_id",
      "embedding", probe, k = 5, bucketLength = 2.0)
    val rows = nn.select("vec_id", "dist").as[(Long, Double)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._2).sliding(2).forall {
      case Array(a, b) => a <= b + 1e-9
      case _ => true
    })
  }
}
