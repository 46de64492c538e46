package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: hand-checked codes, zero-vector guard, mse identity") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Quantize.int8(df, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Double, Seq[Long], Double)].collect()
    // scale = 2/127; q = floor(x*127/2 + .5) = [64, -127, 32]
    val s = 2.0 / 127
    assert(math.abs(r(0)._2 - s) < 1e-15)
    assert(r(0)._3 == Seq(64L, -127L, 32L))
    val mse = Seq(1.0f, -2.0f, 0.5f).map(_.toDouble)
      .zip(Seq(64L, -127L, 32L))
      .map { case (x, q) => math.pow(x - s * q, 2) }.sum / 3
    assert(math.abs(r(0)._4 - mse) < 1e-12)
    // zero vector: scale 0, zero codes, zero error
    assert(r(1)._2 == 0.0 && r(1)._3 == Seq(0L, 0L, 0L) && r(1)._4 == 0.0)
  }

  test("int8 on the fixture: codes bounded, max element saturates, mse within s^2/4") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    val r = Quantize.int8(emb, "vec_id", "embedding")
      .as[(Long, Double, Seq[Long], Double)].collect()
    assert(r.length == emb.count())
    assert(r.forall(_._3.forall(q => q >= -127 && q <= 127)))
    // the max-|x| element maps to exactly +/-127 whenever scale > 0
    assert(r.filter(_._2 > 0).forall(_._3.exists(q => math.abs(q) == 127)))
    // per-element quantization error is at most scale/2 (+ float slack)
    assert(r.forall(x => x._4 <= x._2 * x._2 / 4 + 1e-12))
  }

  test("int8: dequantized vectors preserve cosine geometry") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
      .filter($"vec_id" < 50)
    val deq = Quantize.int8(emb, "vec_id", "embedding")
      .withColumn("recon", transform(col("q"),
        q => q.cast("double") * col("scale")))
    val drift = deq.join(emb, "vec_id")
      .select(Similarity.cosine(col("embedding"), col("recon")).as("c"))
      .agg(min("c")).as[Double].head()
    assert(drift > 0.99, s"int8 round-trip cosine fell to $drift")
  }
}
