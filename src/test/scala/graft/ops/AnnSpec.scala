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

  test("knnLabelAgreement: every row reported; counts and bounds consistent") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val r = Ann.knnLabelAgreement(emb, "vec_id", "embedding", "label", 4, 10)
      .as[(Long, Int, Long, Long, Option[Double])].collect()
    assert(r.length == emb.count())
    assert(r.forall { case (_, _, n, same, agree) =>
      same <= n && n <= 10 &&
        agree.forall(a => a >= 0.0 && a <= 1.0) &&
        (agree.isEmpty == (n == 0L))
    })
    // agreement is exactly n_same / n_neighbors (9 dp)
    assert(r.filter(_._3 > 0).forall { case (_, _, n, same, agree) =>
      math.abs(agree.get -
        BigDecimal(same.toDouble / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12
    })
  }

  test("knnLabelAgreement: a planted flipped label is flagged") {
    // identical vectors in one bucket, one row mislabeled -> its
    // neighbors all disagree (agreement 0), the rest mostly agree
    val rows = (0L to 9L).map(i =>
      (i, Array.fill(8)(1.0f), if (i == 0) 1 else 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val r = Ann.knnLabelAgreement(df, "vec_id", "embedding", "label", 2, 5)
      .as[(Long, Int, Long, Long, Option[Double])].collect()
      .map(x => x._1 -> x._5.get).toMap
    assert(r(0L) == 0.0, "flipped row must have zero agreement")
    assert((1L to 9L).forall(r(_) > 0.5), "clean rows must mostly agree")
  }

  test("hardNegatives: cross-label only, ranked, no self pairs") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val r = Ann.hardNegatives(emb, "vec_id", "embedding", "label", 4, 5)
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x._2 != x._4), "negative must carry another label")
    assert(r.forall(x => x._1 != x._3))
    r.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._6).sorted.sameElements(1 to rs.length))
      // ranks follow cosine desc
      assert(rs.sortBy(_._6).map(_._5).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)))
    }
  }

  test("annTopKQuantized: int8-domain search tracks the float-domain ANN") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val qres = Ann.annTopKQuantized(emb, "vec_id", "embedding", 4, 5)
    val fres = Ann.annTopK(emb, emb, "vec_id", "embedding", 4, 5)
    // quantized cosines drift from float cosines by at most ~1/127-scale
    val drift = qres.select($"probe_id", $"vec_id", $"cos".as("qcos"))
      .join(fres.select($"probe_id", $"vec_id", $"cos".as("fcos")),
        Seq("probe_id", "vec_id"))
      .select(max(abs($"qcos" - $"fcos"))).as[Double].head()
    assert(drift < 0.05, s"quantized cosine drift $drift too large")
    // and the retrieved sets substantially overlap (buckets may differ
    // near hyperplanes, scores near ties)
    val common = qres.select("probe_id", "vec_id")
      .join(fres.select("probe_id", "vec_id"), Seq("probe_id", "vec_id"))
      .count().toDouble
    val total = fres.count().toDouble
    assert(common / total > 0.6,
      s"quantized ANN recovered only ${common / total} of float ANN pairs")
  }

  test("labelPrototypes: planted outlier scores low, members high, zero vector NULL") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.1f), 0),
      (3L, Seq(0.9f, 0.0f), 0),
      (4L, Seq(0.0f, 1.0f), 0),   // planted outlier inside label 0
      (5L, Seq(0.0f, 1.0f), 1),
      (6L, Seq(-0.05f, 1.0f), 1),
      (7L, Seq(0.0f, 0.0f), 1)    // zero vector -> NULL score
    ).toDF("vec_id", "embedding", "label")
    val r = Ann.labelPrototypes(emb, "vec_id", "embedding", "label")
      .select($"vec_id", $"proto_cos").as[(Long, Option[Double])]
      .collect().toMap
    assert(r.size == 7)
    assert(r(7L).isEmpty, "zero vector must score NULL")
    assert(r.collect { case (_, Some(c)) => c }.forall(c =>
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    // members of label 0 agree with their centroid far better than the
    // planted orthogonal outlier
    assert(r(1L).get > 0.8 && r(3L).get > 0.8)
    assert(r(4L).get < 0.5, s"outlier scored ${r(4L)}")
    assert(r(4L).get < r(1L).get - 0.3)
    // label-1 members (outlier-free) sit near 1
    assert(r(5L).get > 0.9 && r(6L).get > 0.9)
  }

  test("hardNegatives: hardest negative is the most similar cross-label vector in bucket") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val top = Ann.hardNegatives(emb, "vec_id", "embedding", "label", 4, 1)
      .filter($"rnk" === 1)
    // recompute the evidence: joining all cross-label bucket-mates,
    // nothing may beat the reported rank-1 cosine
    val cb = Dedup.srpBuckets(emb, "vec_id", "embedding", 4,
      carry = Seq("label"))
    val all = cb.select($"bucket", $"vec_id".as("anchor_id"),
        $"embedding".as("av"), $"label".as("anchor_label"))
      .join(cb.select($"bucket", $"vec_id".as("neg_id"),
        $"embedding".as("nv"), $"label".as("neg_label")), Seq("bucket"))
      .filter($"anchor_id" =!= $"neg_id" && $"anchor_label" =!= $"neg_label")
      .groupBy($"anchor_id")
      .agg(max(round(Similarity.cosine($"nv", $"av"), 9)).as("best"))
    val joined = top.join(all, Seq("anchor_id"))
      .select($"cos", $"best").as[(Double, Double)].collect()
    assert(joined.nonEmpty && joined.forall { case (c, b) => c == b })
  }

  test("recallReport: per-probe hits bounded by k; exact-vs-exact is recall 1") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, probes, 5)
    val approx = Ann.annTopK(emb, probes, "vec_id", "embedding", 4, 5)
    val rep = Ann.recallReport(approx, exact)
      .as[(Long, Long, Long, Double)].collect()
    assert(rep.length == 10) // one row per probe, the exact side's spine
    rep.foreach { case (_, nExact, nHit, recall) =>
      assert(nExact == 5 && nHit >= 0 && nHit <= nExact)
      assert(math.abs(recall - nHit.toDouble / nExact) < 1e-8)
    }
    // the report's mean recomputes the scalar driver-side recall
    val scalar = Ann.recallAgainstExact(approx, exact)
    val mean = rep.map(_._3).sum.toDouble / rep.map(_._2).sum
    assert(math.abs(mean - scalar) < 1e-8)
    // degenerate audit: an index audited against itself is perfect
    val self = Ann.recallReport(exact, exact).as[(Long, Long, Long, Double)]
      .collect()
    assert(self.forall(r => r._4 == 1.0))
  }
}
