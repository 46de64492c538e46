package graft.app

import org.apache.spark.sql.DataFrame
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
  * partition chunk fan-out. Three frames are persisted because they are
  * read more than once: the exact-dedup survivors (feed shingling,
  * chunking and a funnel count), the shingle arrays (read three times
  * inside the near-dedup — signatures plus both Jaccard-verify sides;
  * re-deriving the interpreted shingle HOF per read is the measured
  * 2-4x trap), and the near-dedup survivors (chunking + count).
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
    * the operational visibility every real curation run wants. The
    * normalized frame and the two gate frames (language, quality) are
    * persisted for the funnel's duration and unpersisted before
    * returning, so every gate pipeline executes exactly ONCE: the
    * languageId explode → broadcast-join → window chain runs once
    * (during the language count) and each later count reads caches —
    * the source is scanned exactly TWICE (input count + the normalize
    * materialization), independent of funnel depth
    * (CorpusPipelineSpec pins the bound with an accumulator-
    * instrumented source). Pass `false` for a pure single-action
    * pipeline.
    *
    * The three persisted frames stay cached so the returned `chunks`
    * stays cheap to consume; a long-lived session running many corpora
    * should prefer [[curateToParquet]], which unpersists them after the
    * sink write. */
  def curate(docs: DataFrame, cfg: Config = Config(),
             collectFunnel: Boolean = true): Result =
    curateFrames(docs, cfg, collectFunnel).result

  /** Internal hand-off between [[curate]] and [[curateToParquet]]:
    * the result plus the near-dedup survivor frame (persisted — the
    * sink's source-tag join reads it instead of re-scanning the input)
    * and every still-persisted frame for the caller to unpersist. */
  private case class Frames(result: Result, survivors: DataFrame,
                            persisted: Seq[DataFrame])

  /** [[curate]] and land the chunk table as parquet partitioned by the
    * survivor's source — the layout downstream training readers prune
    * on. The write materializes everything, so the internally persisted
    * frames are unpersisted before returning (re-consuming the returned
    * `chunks` afterwards re-derives the funnel; read the sink instead).
    * The source tag joins in from the PERSISTED survivor frame (chunk
    * doc_ids are exactly its ids), never by re-scanning the input. */
  def curateToParquet(docs: DataFrame, outPath: String,
                      cfg: Config = Config()): Result = {
    val f = curateFrames(docs, cfg, collectFunnel = true)
    val withSource = f.result.chunks.join(
      f.survivors.select(col("doc_id"), col("source")), Seq("doc_id"))
    Sources.writeParquetPartitioned(withSource, outPath, Seq("source"))
    f.persisted.foreach(_.unpersist())
    f.result
  }

  private def curateFrames(docs: DataFrame, cfg: Config,
                           collectFunnel: Boolean): Frames = {
    // normalize FIRST so the gates, dedup shingles and chunks all see
    // canonical text; normalization can empty a document (all symbols).
    // With collectFunnel this and the two gate frames persist for the
    // funnel's duration (unpersisted below): languageId alone reads its
    // input three times (hit counting, tag column, outer join), so an
    // unpersisted normed would re-scan the source per reference.
    val normed0 = docs.select(col("doc_id"),
        Text.normalize(col("text")).as("text"), col("lang"), col("source"))
      .filter(length(col("text")) > 0)
    val normed =
      if (collectFunnel) normed0.persist(StorageLevel.MEMORY_AND_DISK)
      else normed0

    // language gate on the n-gram-profile PREDICTION, not the source-
    // provided tag (at corpus scale the tag is missing or wrong).
    // With collectFunnel the gate frames persist for the funnel's
    // duration (unpersisted below): downstream counts and the dedup
    // build then read the cache instead of re-running the gate chains.
    val inLang0 = normed.join(
      Text.languageId(normed, "text")
        .filter(col("pred_lang").isin(cfg.keepLangs.toSeq: _*))
        .select("doc_id"),
      Seq("doc_id"))
    val inLang =
      if (collectFunnel) inLang0.persist(StorageLevel.MEMORY_AND_DISK)
      else inLang0

    // quality gate: length/alpha/stopword/digit composite
    val good0 = inLang.join(
      Text.qualityScore(inLang, "text")
        .filter(col("quality_score") >= cfg.minQuality)
        .select("doc_id"),
      Seq("doc_id"))
    val good =
      if (collectFunnel) good0.persist(StorageLevel.MEMORY_AND_DISK)
      else good0

    // exact dedup (hash-groupBy, deterministic min-id survivor), then
    // near-dedup with the transitive-cluster policy
    val exact = Dedup.dedupExact(good, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shingled = exact.select(col("doc_id"),
        Text.shingles(Text.tokens(col("text")), cfg.shingleN).as("shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val near = Dedup.dedupNearClustered(exact, "doc_id", shingled,
        cfg.minhashPerms, cfg.bands, cfg.rowsPerBand, cfg.jaccardTau)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val chunks = Text.chunk(near, "text", cfg.chunkTokens)

    val funnel =
      if (!collectFunnel) Seq.empty
      else {
        // count order matters: `exact` (persisted) materializes from the
        // cached gates BEFORE they unpersist, so nothing downstream ever
        // re-runs a gate pipeline
        val counts = Seq(
          "input" -> docs.count(),
          "normalized_non_empty" -> normed.count(),
          "language" -> inLang.count(),
          "quality" -> good.count(),
          "exact_dedup" -> exact.count(),
          "near_dedup" -> near.count(),
          "chunks" -> chunks.count())
        good.unpersist()
        inLang.unpersist()
        normed.unpersist()
        counts
      }
    Frames(Result(chunks, funnel), near, Seq(near, shingled, exact))
  }
}
