package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes text classifier — the learned quality/language
  * filter of LLM data pipelines (the GPT-3 / CCNet "fastText-style linear
  * classifier" slot), expressed relationally so training and scoring are
  * plain aggregations and joins.
  *
  * Unlike [[graft.ops.Text.languageId]] (a fixed n-gram heuristic profile),
  * this classifier is *trained* from labeled rows: class priors and
  * Laplace-smoothed token likelihoods are exact corpus counts, so the whole
  * train → score path is deterministic and DuckDB-oracle-able (q85) — no
  * SGD, no RNG.
  *
  * Math (per document d, class c, smoothing α=1):
  * {{{
  *   score(d,c) = ln(docs_c / docs_total)
  *              + Σ_{t ∈ d} tf_{d,t} · ln(cnt_{c,t} + 1)
  *              − n_d · ln(tokens_c + V)
  * }}}
  * The −n_d·ln(tokens_c+V) factoring makes unseen (token, class) pairs
  * contribute exactly 0 to the Σ term, so the scoring join can be INNER on
  * observed counts — no dense vocab × classes frame is ever materialized.
  *
  * Scale posture (100 TB corpus, lexicon-sized model):
  *  - train: one (label, token)-keyed count shuffle over the exploded
  *    corpus + a label-keyed class rollup + one distinct-token count; the
  *    corpus itself is read once and never re-shuffled;
  *  - score: tf aggregates doc-keyed; the model (≈ lexicon × classes rows)
  *    broadcasts into the token match, so the corpus-sized tf frame meets
  *    it map-side; the class table (a handful of rows) broadcasts into the
  *    dense (doc × class) base. Drop the broadcast hint if the lexicon
  *    outgrows driver memory — the join is token-keyed equi either way.
  */
object NaiveBayesText {

  /** Trained model: `classes` (label, n_docs, n_tokens), `tokenCounts`
    * (label, token, cnt), `totals` (1 row: docs_total, vocab_v). The
    * shared (label, token, tf) aggregate materializes once behind a
    * barrier at train time (lexicon × classes rows — bounded at any
    * corpus size); the three model frames stay lazy views over it. */
  case class Model(classes: DataFrame, tokenCounts: DataFrame,
                   totals: DataFrame)

  /** Whitespace-token multiset of `textCol` as (row, token, tf) — empty
    * tokens dropped, matching DuckDB `string_split` + `WHERE w <> ''`. */
  private def tf(docs: DataFrame, idCols: Seq[String], textCol: String) =
    docs.select(idCols.map(col) :+
        explode(split(col(textCol), " ")).as("token"): _*)
      .where(col("token") =!= "")
      .groupBy(idCols.map(col) :+ col("token"): _*)
      .agg(count(lit(1)).as("tf"))

  /** Train on labeled documents: exact counts, Laplace α=1 applied at
    * score time. */
  def train(docs: DataFrame, textCol: String, labelCol: String): Model = {
    // The (label, token, tf) aggregate is consumed THREE times below
    // (token counts, per-class token totals, the vocab count), and each
    // consumer would otherwise re-run the corpus explode+count — cut it
    // once (guide §1.2; it is lexicon-sized, so the barrier is bounded
    // at any corpus scale).
    val toks = graft.ops.Barrier.cut(tf(docs, Seq(labelCol), textCol)
      .withColumnRenamed(labelCol, "label"))
    val tokenCounts = toks.groupBy("label", "token")
      .agg(sum("tf").as("cnt"))
    val classes = toks.groupBy("label")
      .agg(sum("tf").as("n_tokens"))
      .join(docs.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("n_docs")), Seq("label"))
    val totals = docs.agg(count(lit(1)).as("docs_total"))
      .crossJoin(toks.select("token").distinct()
        .agg(count(lit(1)).as("vocab_v")))
    Model(classes, tokenCounts, totals)
  }

  /** Per-(document, class) scores: (idCol, label, avg_logp), where
    * avg_logp is the log-posterior normalized by the document's token
    * count — score(d,c)/n_d. Normalizing changes no argmax (n_d > 0 is
    * constant within a document) and makes the value length-invariant,
    * so one threshold works for short and long documents — and keeps the
    * magnitude ~ln(vocab), where 9-dp rounding is exact cross-engine
    * (same regime as [[graft.ops.Text.bigramLogProb]]). */
  def score(model: Model, docs: DataFrame, idCol: String,
            textCol: String): DataFrame = {
    val docTf = tf(docs, Seq(idCol), textCol)
    val seen = docTf
      .join(broadcast(model.tokenCounts), Seq("token"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf") * log(col("cnt") + lit(1))).as("ssum"))
    // n_d is the doc's non-empty token count — computable MAP-ONLY from
    // the text itself instead of a second corpus explode + doc-keyed
    // shuffle over docTf (guide §2.4). The n_d > 0 guard reproduces the
    // aggregate form's semantics exactly: a doc with no tokens had no
    // docTf group and so never appeared.
    val docLen = docs
      .select(col(idCol),
        size(array_remove(split(col(textCol), " "), ""))
          .cast("long").as("n_d"))
      .where(col("n_d") > 0)
    docLen
      .crossJoin(broadcast(model.classes.crossJoin(model.totals)))
      .join(seen, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        ((log(col("n_docs") / col("docs_total"))
          + coalesce(col("ssum"), lit(0.0))
          - col("n_d") * log(col("n_tokens") + col("vocab_v")))
          / col("n_d")).as("avg_logp"))
  }

  /** Argmax classification with the runner-up margin:
    * (idCol, pred_label, avg_logp, margin). Ties break on label
    * ascending — identically in the oracle. */
  def classify(model: Model, docs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(col("avg_logp").desc, col("label").asc)
    score(model, docs, idCol, textCol)
      .withColumn("rk", row_number().over(w))
      .withColumn("margin", col("avg_logp") - lead("avg_logp", 1).over(w))
      .where(col("rk") === 1)
      .select(col(idCol), col("label").as("pred_label"),
        col("avg_logp"), col("margin"))
  }

  /** Confidence-calibration report over a scored frame — does the
    * classifier's margin actually track its accuracy? Rows rank by
    * margin (desc) into `bins` equal-count bins (ntile); per bin the
    * report carries doc count, correct count, exact accuracy and the
    * margin range. A well-calibrated filter shows accuracy monotone in
    * bin; the flat or inverted shape is the signal to retrain before
    * trusting the filter's threshold — the check a data team runs before
    * wiring [[classify]]'s output into a curation gate.
    *
    * `scored` needs (idCol, margin, correct: boolean) — the shape
    * [[classify]] joined back to gold labels produces (q85). Margins are
    * 9-dp-rounded BEFORE ranking with idCol as the tiebreak (the
    * [[graft.ops.Text.perplexityBuckets]] idiom), so bin boundaries are
    * bit-deterministic cross-engine; accuracy is a ratio of exact
    * integer counts.
    *
    * Scale: the ntile window is a global order over the scored frame —
    * calibration runs on an eval-sized labeled sample (gold labels are
    * hand-made; there is no 100 TB labeled frame), so the single-task
    * sort is bounded by construction. */
  def calibration(scored: DataFrame, idCol: String,
                  bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val w = Window.orderBy(graft.ops.Portable.ratio9(col("margin")).desc,
      col(idCol).asc)
    scored
      .withColumn("__m", graft.ops.Portable.ratio9(col("margin")))
      .withColumn("bin", ntile(bins).over(w).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
        max(col("__m")).as("max_margin"),
        min(col("__m")).as("min_margin"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        graft.ops.Portable.intRatio9(col("n_correct"), col("n_docs"))
          .as("accuracy"),
        col("max_margin"), col("min_margin"))
  }
}
