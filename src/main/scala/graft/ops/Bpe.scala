package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING and encoding, distributed (SURVEY.md
  * §7.4 text analysis, beyond the BPE-ish regex estimate of
  * [[Text.tokenStats]]): the standard subword-tokenizer training loop
  * (Sennrich et al., ACL'16 — the GPT-2/RoBERTa tokenizer recipe) as
  * Spark dataflow.
  *
  * The key scale observation (same as the single-node reference
  * implementations): merges are learned from the WORD-FREQUENCY table,
  * never from the corpus — a 100 TB corpus collapses to a vocabulary
  * frame (one row per distinct word) in one shuffle, and every learning
  * round runs over that compact frame. Encoding likewise: the distinct
  * words are segmented once by the learner, and documents meet the
  * segmentation with a dictionary join — the corpus itself is never
  * char-split.
  *
  * Greedy merge semantics (both the learner's apply step and the oracle):
  * one round replaces adjacent symbol pairs (l, r) left-to-right,
  * non-overlapping — a run of m identical symbols merges ⌊m/2⌋ leftmost
  * pairs. The tie-break is (pair_count DESC, left ASC, right ASC), so
  * learning is fully deterministic and DuckDB-oracle-able.
  */
object Bpe {

  /** Learned merges + the final word segmentation they induce.
    * `merges`: (rank, left, right, merged, pair_count), rank 1-based in
    * learning order — tiny (≤ numMerges rows). `vocab`: (word, count,
    * symbols) — the segmentation of every distinct corpus word after all
    * merges, i.e. the word→subword encoding table. */
  case class Learned(merges: DataFrame, vocab: DataFrame)

  /** Word-frequency table of a corpus — the only corpus-sized pass in
    * BPE training (one explode + one word-keyed shuffle with map-side
    * combine). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode_outer(Text.tokens(col(textCol))).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("count"))

  /** Adjacent symbol pairs of one round's segmentation, weighted by word
    * count: (l, r, c) with c = Σ word_count over occurrences. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val prs = zip_with(
      slice(col("symbols"), lit(1),
        greatest(size(col("symbols")) - 1, lit(0))),
      slice(col("symbols"), lit(2),
        greatest(size(col("symbols")) - 1, lit(0))),
      (l, r) => struct(l.as("l"), r.as("r")))
    vocab.select(col("count"), explode_outer(prs).as("__p"))
      .filter(col("__p").isNotNull)
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("count")).as("c"))
  }

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (l, r) become l+r, non-overlapping (the fold's freshly-merged last
    * element is l+r, which never equals l since r is non-empty, so a
    * consumed symbol can't immediately re-merge — runs of an identical
    * symbol merge ⌊m/2⌋ leftmost pairs exactly like reference BPE). */
  private def mergeOnce(symbols: Column, l: String, r: String): Column =
    aggregate(symbols, array().cast("array<string>"), (acc, s) =>
      when(size(acc) === 0, array(s))
        .otherwise(
          when(element_at(acc, size(acc)) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s)))))

  /** Learn up to `numMerges` BPE merges from a (word, count) frame.
    *
    * Per round: pair counts over the vocabulary frame (one compact
    * shuffle with map-side combine), the argmax pair collected to the
    * driver (a bounded 1-row action, same contract as the best-run
    * probes), the merge applied map-only, and the new segmentation cut
    * behind a [[Barrier]] — without the cut each round's plan would
    * stack k interpreted merge-folds deep (the plan-tree multiplication
    * trap). Stops early when no adjacent pair remains. Eager by nature —
    * it is a training loop, like [[graft.ml.Prod2Vec]]. */
  def learn(wordCounts: DataFrame, numMerges: Int): Learned = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var vocab = Barrier.cut(wordCounts.select(col("word"), col("count"),
      split(col("word"), "").as("symbols")))
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, l + r, c))
        vocab = Barrier.cut(vocab.select(col("word"), col("count"),
          mergeOnce(col("symbols"), l, r).as("symbols")))
        rank += 1
      }
    }
    Learned(
      merges.result().toDF("rank", "left", "right", "merged", "pair_count")
        .withColumn("rank", col("rank").cast("long")),
      vocab)
  }

  /** Encode a corpus with a learned segmentation: documents tokenize,
    * each word meets `vocab`'s symbols through a dictionary join (words
    * absent from the vocabulary fall back to their character symbols),
    * and the per-document subword stream reassembles in word order.
    * Returns (doc_id, n_words, n_bpe_tokens, bpe_text).
    *
    * Shape: one tokenize + posexplode, one join keyed on the word (the
    * segmentation table is vocabulary-sized — broadcast when it fits;
    * AQE decides, no hint forced since real subword vocabularies can
    * exceed the broadcast budget), one doc-keyed re-agg. */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val words = df
      .select(col("doc_id"),
        posexplode_outer(Text.tokens(col(textCol))).as(Seq("__pos", "word")))
      .filter(col("word").isNotNull && col("word") =!= "")
    words
      .join(vocab.select(col("word"), col("symbols")), Seq("word"), "left")
      .select(col("doc_id"), col("__pos"),
        coalesce(col("symbols"), split(col("word"), "")).as("__syms"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__syms"))))
        .as("__ordered"))
      .select(col("doc_id"),
        size(col("__ordered")).cast("long").as("n_words"),
        size(flatten(transform(col("__ordered"), s => s("__syms"))))
          .cast("long").as("n_bpe_tokens"),
        concat_ws(" ", flatten(transform(col("__ordered"), s => s("__syms"))))
          .as("bpe_text"))
  }

  /** Tokenizer fertility report — the standard tokenizer-evaluation
    * rollup (Ács/Rust et al.: how many subword tokens the tokenizer
    * spends per word, and how many characters each token carries) per
    * corpus slice. A slice whose fertility runs hot is one the
    * tokenizer's merges never learned (under-represented language or
    * domain — its documents cost proportionally more sequence length
    * per word at training time); chars-per-token collapsing toward 1
    * means the slice degrades to character segmentation. Output per
    * `groupCols` group: (n_docs, n_words, n_tokens, n_chars,
    * fertility = n_tokens/n_words, chars_per_token = n_chars/n_tokens).
    * Only documents contributing at least one word count toward
    * `n_docs`; a group with no words at all yields no row (never 0/0).
    *
    * Shape: one tokenize + explode, the word-keyed dictionary join of
    * [[encode]] (AQE broadcasts vocabulary-sized tables), then ONE
    * rollup straight to the group key — the per-document reassembly of
    * [[encode]] (its collect_list and order-restoring sort) is skipped
    * entirely because only counts survive, so nothing document-sized is
    * ever buffered. The distinct-doc count rides the same agg as a
    * count-distinct expansion over the group-keyed shuffle. At 100 TB:
    * one corpus scan, one word join, one low-cardinality agg. */
  def fertility(df: DataFrame, textCol: String, vocab: DataFrame,
                groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val words = df
      .select(groupCols.map(col) ++ Seq(col("doc_id"),
        explode_outer(Text.tokens(col(textCol))).as("word")): _*)
      .filter(col("word").isNotNull && col("word") =!= "")
    words
      .join(vocab.select(col("word"), size(col("symbols")).as("__k")),
        Seq("word"), "left")
      .select(groupCols.map(col) ++ Seq(col("doc_id"),
        length(col("word")).cast("long").as("__chars"),
        // OOV words fall back to character segmentation, same as encode
        coalesce(col("__k"), length(col("word"))).cast("long")
          .as("__toks")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("__toks")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"))
      .select(groupCols.map(col) ++ Seq(col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") / col("n_words"), 9)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_tokens"), 9)
          .as("chars_per_token")): _*)
  }
}
