package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression (SURVEY.md §7.4) — at 100 TB the embedding
  * column IS the storage bill (a 768-dim float32 vector is 3 KB/row),
  * and symmetric int8 quantization is the standard 4× cut that keeps
  * cosine rankings essentially intact (the ANN/dedup operators consume
  * the dequantized vectors unchanged).
  *
  * Per-vector symmetric scheme: `scale = max|x| / 127`,
  * `q_i = clamp(floor(x_i / scale + 0.5), -127, 127)` — round-half-up
  * spelled as floor(+0.5) because both engines define floor identically
  * (banker's-rounding `round()` differs between engines on exact .5
  * ties, floor never does). A zero vector has scale 0 and quantizes to
  * zeros (the division is guarded — IEEE x/0 would be ±Inf and ANSI
  * mode faults the long cast). The per-vector reconstruction MSE is
  * computed from three [[graft.functions.FoldDot]] dot products via
  *   Σ(x − s·q)² = x·x − 2s(x·q) + s²(q·q)
  * so the error never needs a materialized reconstruction array, and
  * the oracle mirrors the identical three-fold + scalar combination.
  *
  * Shape: map-only — no shuffle, no driver round-trip; the per-element
  * lambda is an interpreted `transform` (a custom codegen Expression
  * would widen the whole-stage span; the scale posture is unaffected —
  * this is pure per-row compute that parallelizes with the scan). */
object Quantize {

  /** The code projection alone: (idCol, carry…, vecCol, scale,
    * q: array<long> in [-127,127]) — map-only, no shuffle. `carry`
    * columns ride along untouched so downstream quantized-domain
    * consumers (e.g. [[Ann.labelPrototypes]]) never pay an id-keyed
    * join to recover them. */
  def int8Codes(df: DataFrame, idCol: String, vecCol: String,
                carry: Seq[String] = Nil): DataFrame = {
    val v = col(vecCol)
    val keep = (col(idCol) +: carry.map(col)) :+ v
    val scaled = df.select(keep :+
      (array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0))
        .as("scale"): _*)
    scaled.withColumn("q",
      when(col("scale") === 0, transform(v, _ => lit(0L)))
        .otherwise(transform(v, x =>
          least(greatest(floor(x.cast("double") / col("scale") + lit(0.5)),
            lit(-127L)), lit(127L)))))
  }

  /** Symmetric per-vector int8 quantization. Returns
    * (idCol, scale, q: array<long> in [-127,127], mse) — `scale`
    * unrounded (it is the dequantization constant, not a report
    * column; round at the edge if displaying). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val id = col(idCol)
    val v = col(vecCol)
    int8Codes(df, idCol, vecCol)
      .withColumn("qd", transform(col("q"), _.cast("double")))
      .select(id, col("scale"), col("q"),
        ((graft.functions.FoldDot(v, v)
          - lit(2.0) * col("scale") * graft.functions.FoldDot(v, col("qd"))
          + col("scale") * col("scale")
            * graft.functions.FoldDot(col("qd"), col("qd")))
          / size(v).cast("double")).as("mse"))
  }
}
