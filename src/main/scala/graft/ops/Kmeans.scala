package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the trainer
  * for the centroid tables every vector operator here consumes
  * ([[Dedup.semanticAssign]]'s clusters, [[Quantize.pqCodes]]'
  * codebooks, [[Quantize.ivfAssign]]'s cells currently pin first-K-rows
  * choices; `fit` upgrades them to data-driven centers without giving
  * up the oracle).
  *
  * Every source of nondeterminism in textbook k-means is closed:
  *  - init is the caller's frame (the first-K-rows pattern — q168 pins
  *    it), not a random sample;
  *  - assignment is argmin of the 9-dp-integerized squared L2
  *    ([[Quantize.l2i]]) with ties to the smaller centroid id;
  *  - the update is [[Similarity.meanPoolEmbeddings]] — per-dimension
  *    exact-LONG sums, one double division sequence, float32 narrowing
  *    — so new centroids are bit-identical at any partitioning and in
  *    the DuckDB oracle's unrolled-CTE replay;
  *  - clusters that lose every member KEEP their previous centroid
  *    (the common "respawn at a random point" policy is unreplayable).
  *
  * Scale shape per iteration: one broadcast of k centroids, one
  * map-side-combined argmin over the corpus, one wide pooled
  * aggregation (shuffle = one dim-wide row per (cluster, map
  * partition)) — the corpus is scanned once per iteration and nothing
  * corpus-sized ever sits on the driver. Iterations chain through
  * [[Barrier.cut]] so the lineage (and any executor loss) never replays
  * iteration i−1 inside iteration i.
  */
object Kmeans {

  /** Hard assignment against the given centroids: (idCol, cluster).
    * Broadcast centroids, map-side-combined argmin — identical tie
    * policy to [[Quantize.ivfAssign]]. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val cen = centroids.select(col(idCol).as("__cid"),
      col(vecCol).as("__cv"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cen))
      .withColumn("__d", Quantize.l2i(col(vecCol), col("__cv")))
      .groupBy(col(idCol))
      .agg(min_by(col("__cid"), struct(col("__d"), col("__cid")))
        .as("cluster"))
  }

  /** One Lloyd update: assign, then per-cluster exact-integer mean;
    * empty clusters keep their previous centroid. Returns the new
    * centroid table in the input's (idCol, vecCol) shape. */
  def step(df: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame): DataFrame = {
    val a = assign(df, idCol, vecCol, centroids)
    val pooled = Similarity.meanPoolEmbeddings(
        a.select(col("cluster"), col(idCol)), "cluster", idCol,
        df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")))
      .select(col("vec_id").as(idCol), col("embedding").as(vecCol))
    val kept = centroids.select(col(idCol), col(vecCol))
      .join(pooled.select(col(idCol)), Seq(idCol), "left_anti")
    pooled.unionByName(kept)
  }

  /** `iters` Lloyd updates from `init` (any (idCol, vecCol) frame with
    * k rows — q168 pins first-K). Returns the final centroid table;
    * feed it back through [[assign]] / [[Quantize.pqCodes]] /
    * [[Quantize.ivfAssign]]. */
  def fit(df: DataFrame, idCol: String, vecCol: String, init: DataFrame,
          iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cen = init.select(col(idCol), col(vecCol))
    for (_ <- 0 until iters)
      cen = Barrier.cut(step(df, idCol, vecCol, cen))
    cen
  }
}
