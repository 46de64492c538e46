package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops.{Dedup, Sources, Text}

/** LLM training-data curation, end-to-end — the 100 TB use case the
  * extension operators exist for (SURVEY.md §7.4), composed into the
  * standard corpus funnel:
  *
  *   documents → normalize → language gate → quality gate
  *     → exact dedup → near-dedup (MinHash→LSH→Jaccard, connected
  *     components, one survivor per transitive cluster)
  *     → token-budget chunking → (optionally) partitioned parquet
  *
  * Every stage is one of the library's spec'd/oracle'd operators; this
  * object only sequences them, so the whole funnel inherits their scale
  * posture: map-only gates, hash-keyed dedup (never all-pairs), in-
  * partition chunk fan-out, and exactly one persist per frame that is
  * read twice (the dedup survivors feed both shingling and chunking).
  */
object CorpusPipeline {

  /** Funnel knobs; defaults mirror the oracle queries' parameters. */
  case class Config(
      keepLangs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      shingleN: Int = 3,
      minhashPerms: Int = 16,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      jaccardTau: Double = 0.5,
      chunkTokens: Int = 64)

  /** Final chunk table + the per-stage survivor counts (empty when
    * `collectFunnel = false`). */
  case class Result(chunks: DataFrame, funnel: Seq[(String, Long)])

  /** Run the funnel over a `documents`-shaped frame
    * (doc_id, text, lang, source).
    *
    * `collectFunnel = true` adds one count() action per stage boundary —
    * the operational visibility every real curation run wants, at the
    * price of re-running the un-persisted upstream gates per count
    * (they are map-only scans; the expensive dedup frames ARE
    * persisted). Pass `false` for a pure single-action pipeline. */
  def curate(spark: SparkSession, docs: DataFrame, cfg: Config = Config(),
             collectFunnel: Boolean = true): Result = {
    // normalize FIRST so the gates, dedup shingles and chunks all see
    // canonical text; normalization can empty a document (all symbols)
    val normed = docs.select(col("doc_id"),
        Text.normalize(col("text")).as("text"), col("lang"), col("source"))
      .filter(length(col("text")) > 0)

    // language gate on the n-gram-profile PREDICTION, not the source-
    // provided tag (at corpus scale the tag is missing or wrong)
    val inLang = normed.join(
      Text.languageId(normed, "text")
        .filter(col("pred_lang").isin(cfg.keepLangs.toSeq: _*))
        .select("doc_id"),
      Seq("doc_id"))

    // quality gate: length/alpha/stopword/digit composite
    val good = inLang.join(
      Text.qualityScore(inLang, "text")
        .filter(col("quality_score") >= cfg.minQuality)
        .select("doc_id"),
      Seq("doc_id"))

    // exact dedup (hash-groupBy, deterministic min-id survivor), then
    // near-dedup with the transitive-cluster policy; both frames are
    // read more than once downstream, hence the persists
    val exact = Dedup.dedupExact(good, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shingled = exact.select(col("doc_id"),
      Text.shingles(Text.tokens(col("text")), cfg.shingleN).as("shingles"))
    val near = Dedup.dedupNearClustered(exact, "doc_id", shingled,
        cfg.minhashPerms, cfg.bands, cfg.rowsPerBand, cfg.jaccardTau)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val chunks = Text.chunk(near, "text", cfg.chunkTokens)

    val funnel =
      if (!collectFunnel) Seq.empty
      else Seq(
        "input" -> docs.count(),
        "normalized_non_empty" -> normed.count(),
        "language" -> inLang.count(),
        "quality" -> good.count(),
        "exact_dedup" -> exact.count(),
        "near_dedup" -> near.count(),
        "chunks" -> chunks.count())
    Result(chunks, funnel)
  }

  /** [[curate]] and land the chunk table as parquet partitioned by the
    * survivor's source — the layout downstream training readers prune
    * on. */
  def curateToParquet(spark: SparkSession, docs: DataFrame, outPath: String,
                      cfg: Config = Config()): Result = {
    val r = curate(spark, docs, cfg)
    val withSource = r.chunks.join(
      docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    Sources.writeParquetPartitioned(withSource, outPath, Seq("source"))
    r
  }
}
