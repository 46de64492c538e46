package graft.ml

import graft.SparkSpec
import graft.ops.{Ann, Similarity, Sources}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
  private lazy val index = IvfIndex.build(emb, "vec_id", "embedding", k = 16)

  test("build: every vector assigned to exactly one of k cells") {
    assert(index.assignments.count() == emb.count())
    assert(index.centroids.count() == 16)
    val cells = index.assignments.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 16))
  }

  test("search: ranked candidates from nprobe cells, self excluded") {
    val probes = emb.filter($"vec_id" < 5)
    val r = IvfIndex.search(index, probes, "vec_id", "embedding",
        nprobe = 4, topK = 5)
      .select("probe_id", "vec_id", "cos", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x._1 != x._2))
    r.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 5)
    }
  }

  test("recall: IVF with nprobe=4/16 recovers most exact neighbors") {
    val probes = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, probes, 5)
    val approx = IvfIndex.search(index, probes, "vec_id", "embedding",
      nprobe = 4, topK = 5)
    val rec = Ann.recallAgainstExact(approx, exact)
    assert(rec > 0.3, s"IVF recall $rec suspiciously low")
  }

  test("semanticDedup with learned centroids: keep-min within cells, deterministic") {
    val kept = IvfIndex.semanticDedup(emb, "vec_id", "embedding",
      k = 8, tau = 0.3)
    val ids = kept.select("vec_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.size < emb.count(),
      s"gate dropped nothing (${ids.size} of ${emb.count()})")
    // same seed -> identical survivor set
    val again = IvfIndex.semanticDedup(emb, "vec_id", "embedding",
      k = 8, tau = 0.3).select("vec_id").as[Long].collect().toSet
    assert(again == ids)
    // unreachable tau keeps everything
    val all = IvfIndex.semanticDedup(emb, "vec_id", "embedding",
      k = 8, tau = 1.1).count()
    assert(all == emb.count())
    // policy audit: every dropped id has a smaller same-cluster
    // neighbor at cos >= tau (recompute the evidence directly)
    val assign = graft.ops.Dedup.semanticAssign(emb, "vec_id", "embedding",
      IvfIndex.build(emb, "vec_id", "embedding", 8).centroids
        .select($"cell".cast("long").as("vec_id"),
          transform($"c", _.cast("float")).as("embedding")))
      .select($"vec_id", $"embedding", $"cluster")
    val a = assign.select($"cluster", $"vec_id".as("ida"), $"embedding".as("va"))
    val b = assign.select($"cluster", $"vec_id".as("idb"), $"embedding".as("vb"))
    val dominated = a.join(b, "cluster").filter($"ida" < $"idb")
      .filter(round(Similarity.cosine($"va", $"vb"), 9) >= 0.3)
      .select($"idb").as[Long].collect().toSet
    assert(ids == assign.select("vec_id").as[Long].collect().toSet -- dominated)
  }
}
