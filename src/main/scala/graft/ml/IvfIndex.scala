package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** IVF (inverted-file) approximate nearest-neighbor index: a KMeans
  * coarse quantizer assigns every corpus vector to its nearest centroid;
  * a probe searches only the `nprobe` closest centroid lists. The
  * centroid count ~ sqrt(corpus) keeps both the assignment join and the
  * per-probe candidate set ~sqrt-sized — the classic FAISS IVF-Flat
  * layout expressed relationally.
  *
  * Complements [[graft.ops.Ann]] (SRP-LSH, deterministic/oracle-able)
  * and [[LshIndex]] (MLlib LSH): IVF adapts to the data distribution
  * (learned centroids) where LSH is data-oblivious. Training is seeded
  * but not cross-engine reproducible — spec-verified, not oracle-backed.
  *
  * Scale posture: centroids (k × dim) broadcast; the corpus is assigned
  * in one map-only pass and the search is a broadcast join from probes
  * to their nprobe lists — the corpus never reshuffles per query.
  */
object IvfIndex {

  /** Assignment table (vec_id, cell, v: array<double>) + centroid table
    * (cell, c: array<double>). */
  case class Index(assignments: DataFrame, centroids: DataFrame)

  /** Build the index: fit seeded KMeans on the vectors, assign each to
    * its cell. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            seed: Long = 42L): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = corpus.select(col(idCol), toVec(col(vecCol)).as("features"))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell").fit(vecs)
    val assignments = model.transform(vecs)
      .select(col(idCol), col("cell"),
        vector_to_array(col("features")).as("v"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "c")
    Index(assignments, centroids)
  }

  /** ANN search: per probe, rank cells by centroid distance, take the
    * `nprobe` nearest, brute-force cosine only within those cells.
    * Centroid table is broadcast (k rows); the candidate join is keyed
    * on cell. Returns (probe_id, vec_id, cos, rnk <= topK). */
  def search(index: Index, probes: DataFrame, idCol: String, vecCol: String,
             nprobe: Int, topK: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      transform(col(vecCol), _.cast("double")).as("pv"))
    val probeCells = p.crossJoin(broadcast(index.centroids))
      .withColumn("cdist",
        Similarity.dot(col("pv"), col("pv")) -
          lit(2.0) * Similarity.dot(col("pv"), col("c")) +
          Similarity.dot(col("c"), col("c")))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(asc("cdist"), asc("cell"))))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cell"))
    probeCells.join(index.assignments, Seq("cell"))
      .filter(col("probe_id") =!= col(idCol))
      .withColumn("cos", Similarity.cosine(col("v"), col("pv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(desc("cos"), asc(idCol))))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col(idCol).as("vec_id"), col("cos"), col("rnk"))
  }

  /** SemDeDup with LEARNED centroids — the paper's actual recipe
    * (k-means cells, then within-cell duplicate pruning): the coarse
    * quantizer's centers feed [[graft.ops.Dedup.semanticDedup]] as the
    * centroid frame. Seeded-deterministic but not cross-engine
    * reproducible (KMeans), so this form is spec-verified while the
    * fixed-centroid form carries the oracle (q73). Centers are cast
    * back to float so within-cell cosines run the same float-array
    * FoldDot path as the oracle'd form. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, tau: Double, seed: Long = 42L): DataFrame = {
    val centers = build(corpus, idCol, vecCol, k, seed).centroids
      .select(col("cell").cast("long").as(idCol),
        transform(col("c"), _.cast("float")).as(vecCol))
    graft.ops.Dedup.semanticDedup(corpus, idCol, vecCol, centers, tau)
  }
}
