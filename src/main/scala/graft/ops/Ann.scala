package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an `array<float>` embedding
  * column (SURVEY.md §7.4) — the scale path beyond the exact broadcast
  * scan in [[Similarity.cosineTopK]].
  *
  * Sign-random-projection LSH: each vector gets a `planes`-bit bucket
  * ([[Dedup.srpBuckets]]); a probe is compared only against its own
  * bucket's candidates. With P planes the corpus splits into ≤ 2^P
  * buckets, so per-probe work drops by ~2^P at the cost of recall (near
  * neighbors landing across a hyperplane are missed — raise recall with
  * fewer planes or multi-table OR-construction). Everything is keyed
  * hashing, so buckets — and therefore results — are deterministic and
  * DuckDB-oracle-able.
  */
object Ann {

  /** Approximate cosine top-k: probes meet only same-bucket candidates.
    * One shuffle keyed on bucket; the per-probe top-k is a window rank
    * over the (small) candidate set. Returns (probe_id, vec_id, cos,
    * rnk ≤ k). */
  def annTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, planes: Int, k: Int): DataFrame = {
    // raw float arrays straight into FoldDot-backed cosine — element casts
    // happen inside the codegen'd fold, no interpreted transform() copy
    val cb = Dedup.srpBuckets(corpus, idCol, vecCol, planes)
      .select(col("bucket"), col(idCol).as("vec_id"), col(vecCol).as("v"))
    val pb = Dedup.srpBuckets(probes, idCol, vecCol, planes)
      .select(col("bucket"), col(idCol).as("probe_id"), col(vecCol).as("pv"))
    cb.join(pb, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(Similarity.cosine(col("v"), col("pv")), 9))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** Multi-table OR-amplification — the documented recall lever: near
    * neighbors split by a hyperplane in one table meet in another, so
    * recall rises with `numTables` at FIXED bucket purity (lowering
    * `planes` instead would grow every bucket and the candidate join).
    * P(candidate) = 1 − (1 − p^planes)^numTables for per-plane agreement
    * probability p = 1 − θ/π.
    *
    * Shape: ONE pass computes all tables' codes ([[Dedup.srpBucketsMulti]]),
    * the candidate join keys on (table, bucket), candidates dedupe on
    * (probe_id, vec_id) BEFORE any vector is moved, and only the deduped
    * candidate set joins the corpus vectors back (probes broadcast).
    * Scoring work is ≤ numTables× the single-table candidate count —
    * never all-pairs. */
  def annTopKMulti(corpus: DataFrame, probes: DataFrame, idCol: String,
                   vecCol: String, planes: Int, k: Int,
                   numTables: Int): DataFrame = {
    val cb = Dedup.srpBucketsMulti(corpus, idCol, vecCol, planes, numTables)
      .select(col("table"), col("bucket"), col(idCol).as("vec_id"))
    val pb = Dedup.srpBucketsMulti(probes, idCol, vecCol, planes, numTables)
      .select(col("table"), col("bucket"), col(idCol).as("probe_id"))
    val cands = cb.join(pb, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
      .distinct()
    val cv = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val pv = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    cands.join(cv, Seq("vec_id"))
      .join(broadcast(pv), Seq("probe_id"))
      .withColumn("cos", round(Similarity.cosine(col("v"), col("pv")), 9))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** kNN label-agreement — the label-noise report (Confident-Learning-
    * style neighborhood check): a vector whose approximate neighbors
    * mostly carry a DIFFERENT label is a suspect annotation (or an
    * embedding-space outlier). Neighbors come from the same SRP bucket
    * (self excluded), ranked by cosine with the [[annTopK]] tiebreak;
    * agreement = n_same / n_neighbors over the ≤ k kept neighbors.
    * Every corpus row appears in the output — bucket singletons get
    * n_neighbors = 0 and a NULL agreement (no evidence either way).
    *
    * Scale: labels ride through the bucket projection (no corpus-sized
    * label join), the candidate join keys on bucket, the agreement agg
    * and the completeness join key on id — nothing all-pairs.
    * Returns (idCol, label, n_neighbors, n_same, agreement). */
  def knnLabelAgreement(corpus: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, planes: Int, k: Int): DataFrame = {
    val cb = Dedup.srpBuckets(corpus, idCol, vecCol, planes,
      carry = Seq(labelCol))
    val a = cb.select(col("bucket"), col(idCol).as("probe_id"),
      col(vecCol).as("pv"), col(labelCol).as("label"))
    val b = cb.select(col("bucket"), col(idCol).as("vec_id"),
      col(vecCol).as("v"), col(labelCol).as("nb_label"))
    val agg = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(Similarity.cosine(col("v"), col("pv")), 9))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rnk") <= k)
      .groupBy(col("probe_id").as(idCol), col("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("nb_label") === col("label"), lit(1L))
          .otherwise(lit(0L))).as("n_same"))
    corpus.select(col(idCol), col(labelCol).as("label"))
      .join(agg, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("n_same"), lit(0L)).as("n_same"),
        when(col("n_neighbors").isNotNull,
          Portable.intRatio9(col("n_same"), col("n_neighbors")))
          .as("agreement"))
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * top-k most-similar vectors with a DIFFERENT label — the negatives
    * that actually move a contrastive loss (a random negative is
    * already far away). Candidates are same-SRP-bucket only (the
    * near-miss region is exactly where hard negatives live), labels
    * ride the bucket projection, and anchors with no cross-label
    * bucket-mate yield no rows. Returns (anchor_id, anchor_label,
    * neg_id, neg_label, cos, rnk ≤ k). */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, planes: Int, k: Int): DataFrame = {
    val cb = Dedup.srpBuckets(corpus, idCol, vecCol, planes,
      carry = Seq(labelCol))
    val a = cb.select(col("bucket"), col(idCol).as("anchor_id"),
      col(vecCol).as("av"), col(labelCol).as("anchor_label"))
    val b = cb.select(col("bucket"), col(idCol).as("neg_id"),
      col(vecCol).as("nv"), col(labelCol).as("neg_label"))
    a.join(b, Seq("bucket"))
      .filter(col("anchor_id") =!= col("neg_id") &&
        col("anchor_label") =!= col("neg_label"))
      .withColumn("cos", round(Similarity.cosine(col("av"), col("nv")), 9))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("anchor_id"))
        .orderBy(desc("cos"), asc("neg_id"))))
      .filter(col("rnk") <= k)
      .select(col("anchor_id"), col("anchor_label"), col("neg_id"),
        col("neg_label"), col("cos"), col("rnk"))
  }

  /** ANN entirely in the quantized domain — the memory-resident-index
    * form: [[graft.ops.Quantize.int8]] codes are 4× smaller than the
    * float vectors, and because symmetric quantization scales a vector
    * by a POSITIVE per-vector constant, that constant cancels from both
    * the SRP signs (sign(s·q·w) = sign(q·w)) and the cosine
    * (cos(s_a q_a, s_b q_b) = cos(q_a, q_b)) — so buckets and scores
    * need only the codes; the float vectors never load. Code dot
    * products are sums of |q| ≤ 127² terms, far inside the 2^53
    * exact-integer range of doubles, so every score is bit-exact in any
    * summation order and the oracle needs no fold-order care.
    *
    * All-corpus probes (the self-kNN form, like [[knnLabelAgreement]]);
    * returns (probe_id, vec_id, cos, rnk ≤ k) where `cos` is the
    * quantized-domain cosine. */
  def annTopKQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                       planes: Int, k: Int): DataFrame = {
    val qz = Quantize.int8(corpus, idCol, vecCol)
      .select(col(idCol), transform(col("q"), _.cast("double")).as("qd"))
    val cb = Dedup.srpBuckets(qz, idCol, "qd", planes)
    val a = cb.select(col("bucket"), col(idCol).as("probe_id"),
      col("qd").as("pq"))
    val b = cb.select(col("bucket"), col(idCol).as("vec_id"),
      col("qd").as("vq"))
    b.join(a, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", round(Similarity.cosine(col("vq"), col("pq")), 9))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(desc("cos"), asc("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** Per-label prototype agreement — the label-noise / outlier scan a
    * curation run does over a labeled embedding table: each vector's
    * cosine to its own label's centroid. Low `proto_cos` flags probable
    * mislabels or out-of-distribution rows (the centroid-distance twin
    * of [[knnLabelAgreement]]'s neighborhood vote).
    *
    * Computed entirely in the quantized domain for cross-engine
    * determinism: per-(label, dim) sums of [[Quantize.int8Codes]] codes
    * are exact integers (order-free), and because cosine is invariant
    * to the positive 1/n factor, the cosine against the integer SUM
    * vector equals the cosine against the mean centroid exactly. Every
    * dot product is a sum of exact-integer terms (|q| ≤ 127, |Σq| ≤
    * 127·n), bit-identical in any summation order while n·127²·dim
    * stays inside 2^53 — i.e. up to ~10⁹ rows per label at dim 1024.
    * A vector is included in its own centroid (standard prototype
    * scoring). Zero-code vectors or zero centroids yield NULL.
    *
    * Shape: map-only quantization → one (label, dim)-keyed partial-agg
    * shuffle (cardinality labels × dim, never corpus-sized) → the
    * labels×dim centroid table broadcasts back — corpus rows are
    * scored map-side and never shuffle. Returns (idCol, labelCol,
    * proto_cos rounded 9dp). */
  def labelPrototypes(corpus: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val codes = Quantize.int8Codes(corpus, idCol, vecCol, Seq(labelCol))
      .select(col(idCol), col(labelCol), col("q"))
    val centroids = codes
      .select(col(labelCol), posexplode(col("q")).as(Seq("pos", "qi")))
      .groupBy(col(labelCol), col("pos"))
      .agg(sum("qi").as("s"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("cd"))
    codes
      .withColumn("qd", transform(col("q"), _.cast("double")))
      .join(broadcast(centroids), Seq(labelCol))
      .withColumn("__dot", graft.functions.FoldDot(col("qd"), col("cd")))
      .withColumn("__qq", graft.functions.FoldDot(col("qd"), col("qd")))
      .withColumn("__cc", graft.functions.FoldDot(col("cd"), col("cd")))
      .select(col(idCol), col(labelCol),
        when(col("__qq") === 0 || col("__cc") === 0,
          lit(null).cast("double"))
          .otherwise(Portable.ratio9(col("__dot")
            / (sqrt(col("__qq")) * sqrt(col("__cc")))))
          .as("proto_cos"))
  }

  /** Per-probe recall report — the relational (and so oracle-able)
    * twin of [[recallAgainstExact]]: for each probe, how many of its
    * exact top-k neighbors the approximate index recovered. This is
    * the audit a production ANN deployment runs continuously on a
    * probe sample to tune the plane/table count — recall is a
    * DISTRIBUTION over probes (hub vectors recall high, sparse-bucket
    * outliers low), and the scalar average hides exactly the tail the
    * report surfaces.
    *
    * Both inputs are (probe_id, vec_id, …) top-k frames — probe-bounded
    * (≤ k rows per probe), so every join and the aggregation key on
    * probe_id with group sizes ≤ k: report cost scales with the probe
    * sample, never the corpus. */
  def recallReport(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("probe_id"), col("vec_id"))
      .withColumn("__hit", lit(1L))
    exact.select(col("probe_id"), col("vec_id"))
      .join(a, Seq("probe_id", "vec_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
      .select(col("probe_id"), col("n_exact"), col("n_hit"),
        Portable.intRatio9(col("n_hit"), col("n_exact"))
          .as("recall"))
  }

  /** Recall of the approximate result against the exact top-k: fraction
    * of (probe, neighbor) pairs the ANN run recovered. Driver for specs
    * and tuning the plane count. */
  def recallAgainstExact(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.select(col("probe_id"), col("vec_id"))
      .join(exact.select(col("probe_id"), col("vec_id")),
        Seq("probe_id", "vec_id"))
      .count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hit / total
  }
}
