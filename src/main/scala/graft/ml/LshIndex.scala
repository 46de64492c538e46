package graft.ml

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH, RegexTokenizer, NGram}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib LSH index wrappers — the library-grade scale path for near-dup
  * and ANN (SURVEY.md §7.4), complementing the oracle-able keyed-hash
  * implementations in [[graft.ops.Dedup]] / [[graft.ops.Ann]]:
  *
  *  - the ops variants are deterministic, cross-engine reproducible, and
  *    verified against DuckDB — use them when results must be exact and
  *    auditable;
  *  - these MLlib variants carry seeded-random internal state (not
  *    reproducible outside Spark) but give tuned multi-table
  *    OR-amplification, `approxSimilarityJoin` (block-nested bucket
  *    join), and `approxNearestNeighbors` out of the box.
  */
object LshIndex {

  /** Shingle-set vectors for MinHash: tokenize → n-grams → binary
    * CountVectorizer. Returns the fitted transform output with a
    * `features` sparse vector per doc. */
  def shingleVectors(docs: DataFrame, textCol: String, n: Int,
                     vocabSize: Int = 1 << 18): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
        .setPattern(" ").setToLowercase(false),
      new NGram().setN(n).setInputCol("__toks").setOutputCol("__grams"),
      new CountVectorizer().setInputCol("__grams").setOutputCol("features")
        .setVocabSize(vocabSize).setBinary(true)))
    pipe.fit(docs).transform(docs)
      .drop("__toks", "__grams")
  }

  /** MinHash-LSH near-dup join: pairs with shingle-set Jaccard distance
    * ≤ `maxDist`. `numTables` OR-amplifies recall. */
  def minhashNearDup(shingled: DataFrame, idCol: String, numTables: Int,
                     maxDist: Double, seed: Long = 42L): DataFrame = {
    val nonEmpty = shingled.filter(col("features").isNotNull)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("__h")
      .setNumHashTables(numTables).setSeed(seed).fit(nonEmpty)
    model.approxSimilarityJoin(nonEmpty, nonEmpty, maxDist, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"), col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Euclidean (bucketed-random-projection) LSH ANN: k nearest corpus
    * vectors for one probe vector. */
  def euclideanAnn(corpus: DataFrame, idCol: String, vecCol: String,
                   probe: Array[Float], k: Int, bucketLength: Double,
                   numTables: Int = 3, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = corpus.select(col(idCol), toVec(col(vecCol)).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("__h")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .fit(vecs)
    model.approxNearestNeighbors(vecs,
        Vectors.dense(probe.map(_.toDouble)), k)
      .select(col(idCol), col("distCol").as("dist"))
  }
}
