package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("annTopK: same-bucket candidates ranked by cosine; self excluded") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 3)
    val r = Ann.annTopK(emb, probes, "vec_id", "embedding", 4, 10)
    val rows = r.select("probe_id", "vec_id", "cos", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x._1 != x._2))
    assert(rows.forall(x => x._3 >= -1.0 - 1e-9 && x._3 <= 1.0 + 1e-9))
    // ranks are dense from 1 per probe
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length))
    }
  }

  test("recall: ANN vs exact top-k is imperfect but substantial") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, probes, 5)
    val approx = Ann.annTopK(emb, probes, "vec_id", "embedding", 4, 5)
    val rec = Ann.recallAgainstExact(approx, exact)
    assert(rec > 0.2, s"recall $rec suspiciously low")
    assert(rec <= 1.0)
  }

  test("OR-amplification: recall rises with tables at fixed planes; table 0 = single") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, probes, 5)
    val single = Ann.annTopK(emb, probes, "vec_id", "embedding", 4, 5)
    val multi = Ann.annTopKMulti(emb, probes, "vec_id", "embedding", 4, 5, 4)
    val recSingle = Ann.recallAgainstExact(single, exact)
    val recMulti = Ann.recallAgainstExact(multi, exact)
    // ORing tables can only add candidates -> recall is monotone
    assert(recMulti >= recSingle, s"multi $recMulti < single $recSingle")
    assert(recMulti > recSingle, s"4 tables added no recall ($recMulti) — " +
      "fixture too easy or table codes not independent")
    // numTables = 1 IS the single-table operator (same plane range)
    val one = Ann.annTopKMulti(emb, probes, "vec_id", "embedding", 4, 5, 1)
      .as[(Long, Long, Double, Int)].collect().toSet
    val base = single.as[(Long, Long, Double, Int)].collect().toSet
    assert(one == base)
  }

  test("100TB shape: ANN join is bucket-keyed, not a cross join") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val plan = Ann.annTopK(emb, emb.filter($"vec_id" < 3), "vec_id",
      "embedding", 4, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
