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
    * merges, i.e. the word→subword encoding table. `rounds`: driver
    * round-trips the learning loop took — numMerges/batch-ish when the
    * batch guard accepts, numMerges when it degrades to sequential (the
    * observable the batching exists to shrink). */
  case class Learned(merges: DataFrame, vocab: DataFrame, rounds: Int)

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

  /** Per-candidate trigram ceiling — for each candidate pair (l, r),
    * the max total count over round-start trigram TYPES that contain
    * (l, r) at positions (1,2) or (2,3). Every pair a merge of (l, r)
    * can CREATE or BOOST maps injectively onto occurrences of such a
    * trigram (the created token's neighbor resolves to one fixed
    * round-start symbol per pair type), so this is a sound upper bound
    * on any post-merge count movement — the number the batch guard
    * compares against. Compact: trigram frame is the same cost class as
    * [[pairCounts]]; candidates broadcast; output ≤ |candidates| rows. */
  private def trigramMax(vocab: DataFrame,
                         cands: Seq[(String, String)]): Map[(String, String), Long] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val cl = broadcast(cands.toDF("cl", "cr"))
    val tri = vocab
      .filter(size(col("symbols")) >= 3)
      .select(col("count"), explode(transform(
        sequence(lit(1), size(col("symbols")) - 2),
        i => struct(
          element_at(col("symbols"), i).as("t1"),
          element_at(col("symbols"), (i + 1).cast("int")).as("t2"),
          element_at(col("symbols"), (i + 2).cast("int")).as("t3")))).as("tr"))
      .select(col("count"), col("tr.t1").as("t1"), col("tr.t2").as("t2"),
        col("tr.t3").as("t3"))
    val m12 = tri.join(cl, col("t1") === col("cl") && col("t2") === col("cr"))
    val m23 = tri.join(cl, col("t2") === col("cl") && col("t3") === col("cr"))
    m12.unionByName(m23)
      .groupBy(col("cl"), col("cr"), col("t1"), col("t2"), col("t3"))
      .agg(sum(col("count")).as("tc"))
      .groupBy(col("cl"), col("cr")).agg(max(col("tc")).as("mt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  /** Learn up to `numMerges` BPE merges from a (word, count) frame.
    *
    * Per round: pair counts over the vocabulary frame (one compact
    * shuffle with map-side combine), the top candidates collected to
    * the driver (a bounded ≤ batch+1-row action, same contract as the
    * best-run probes), the merges applied map-only, and the new
    * segmentation cut behind a [[Barrier]] — without the cut each
    * round's plan would stack k interpreted merge-folds deep (the
    * plan-tree multiplication trap). Stops early when no adjacent pair
    * remains. Eager by nature — it is a training loop, like
    * [[graft.ml.Prod2Vec]].
    *
    * `batch` > 1 accepts up to `batch` merges per round while staying
    * BIT-IDENTICAL to the sequential (batch = 1) result — the scale
    * lever that turns a 32k-merge vocabulary from 32k sequential Spark
    * jobs into ~32k/batch (the round-7 scale ceiling). The prefix rule
    * guaranteeing equivalence: walk the candidates in (count DESC, l,
    * r) order and accept p_k only while
    *   (a) its symbols are string-disjoint from every accepted pair
    *       (its count is then invariant under the earlier merges — a
    *       merge site consumes only its own two symbols), and
    *   (b) c_k STRICTLY exceeds every accepted merge's [[trigramMax]]
    *       ceiling — every pair an earlier accepted merge can create is
    *       then strictly below c_k, and
    *   (c) no accepted merged string ALIASES a pre-existing symbol OR
    *       an earlier accept of the SAME round (checked against a
    *       conservative driver-side superset — initial alphabet ∪ every
    *       merge so far — plus the round's own merged strings: two
    *       symbol-disjoint accepts can still spell one token, summing
    *       two trigram families onto one pair type) — aliasing is the
    *       one mechanism by which an EXISTING pair's count can rise,
    *       so with it excluded every unaccepted pair is bounded by its
    *       round-start count and the original sort order decides.
    * Under (a)+(b)+(c), each accepted p_k is the unique sequential
    * argmax at its step: higher-ranked pairs are already merged
    * (prefix contiguity — stop at the first rejection), lower-ranked
    * old pairs can only have decreased (ties resolve to p_k by the
    * original (l, r) order), created pairs sit strictly below c_k, and
    * nothing is boosted. A merge that itself aliases (its merged
    * string is in the superset) is accepted but ENDS the round —
    * sequential counts after it may rise in ways the round-start frame
    * can't see. On Zipfian pair distributions the top counts clear the
    * trigram ceilings and rounds accept near-`batch` merges; on
    * flat/adversarial ones the guard degrades gracefully to 1 per
    * round — never to a wrong table. Equivalence is law-checked in
    * BpeSpec; q81/q82 hash against the sequential unrolled-CTE oracle
    * with the batched path live. */
  def learn(wordCounts: DataFrame, numMerges: Int,
            batch: Int = 1): Learned = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var vocab = Barrier.cut(wordCounts.select(col("word"), col("count"),
      split(col("word"), "").as("symbols")))
    // conservative symbol superset for the alias check (c): initial
    // alphabet (one cheap compact collect — character vocabulary) plus
    // every merged string as it is created. Superset-ness only ever
    // ends a round early, never admits a wrong merge.
    var symSuper: Set[String] =
      if (batch > 1)
        vocab.select(explode(col("symbols")).as("s")).distinct()
          .collect().map(_.getString(0)).toSet
      else Set.empty
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var rounds = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      rounds += 1
      val want = math.min(batch, numMerges - rank + 1)
      val top = pairCounts(vocab)
        .orderBy(desc("c"), asc("l"), asc("r")).limit(want).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = Seq.newBuilder[(String, String, Long)]
        accepted += top(0)
        // a merge whose string aliases an existing symbol ends the round
        var aliased = symSuper.contains(top(0)._1 + top(0)._2)
        if (want > 1 && top.length > 1 && !aliased) {
          val trig = trigramMax(vocab, top.toSeq.map(t => (t._1, t._2)))
          var used = Set(top(0)._1, top(0)._2)
          // the round's own merged strings join the alias check: two
          // symbol-disjoint accepts can still SPELL the same token
          // ((ab,cd) and (abc,d) both -> "abcd"), and their created-pair
          // counts then alias onto one pair type whose total the
          // per-merge trigram ceilings never bounded — so a batch-local
          // spelling collision ends the round exactly like a symSuper hit
          var localMerged = Set(top(0)._1 + top(0)._2)
          var maxTrig = trig.getOrElse((top(0)._1, top(0)._2), 0L)
          var k = 1
          var stop = false
          while (!stop && k < top.length) {
            val (l, r, c) = top(k)
            if (!used(l) && !used(r) && c > maxTrig) {
              accepted += top(k)
              used = used + l + r
              maxTrig = math.max(maxTrig, trig.getOrElse((l, r), 0L))
              if (symSuper.contains(l + r) || localMerged.contains(l + r)) {
                aliased = true; stop = true
              }
              localMerged = localMerged + (l + r)
              k += 1
            } else stop = true
          }
        }
        val batchPairs = accepted.result()
        if (batch > 1)
          symSuper = symSuper ++ batchPairs.map(p => p._1 + p._2)
        batchPairs.foreach { case (l, r, c) =>
          merges += ((rank, l, r, l + r, c))
          rank += 1
        }
        // disjoint ⇒ order-independent; nest in rank order anyway
        val newSyms = batchPairs.foldLeft(col("symbols")) {
          case (acc, (l, r, _)) => mergeOnce(acc, l, r) }
        vocab = Barrier.cut(vocab.select(col("word"), col("count"),
          newSyms.as("symbols")))
      }
    }
    Learned(
      merges.result().toDF("rank", "left", "right", "merged", "pair_count")
        .withColumn("rank", col("rank").cast("long")),
      vocab, rounds)
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
        Portable.intRatio9(col("n_tokens"), col("n_words"))
          .as("fertility"),
        Portable.intRatio9(col("n_chars"), col("n_tokens"))
          .as("chars_per_token")): _*)
  }

  /** Frequency-mined WordPiece vocabulary (the position-aware subword
    * inventory of Schuster & Nakajima'12 / BERT, mined directly from
    * substring frequencies instead of merge learning — the cheap
    * one-pass alternative to [[learn]]): every substring of length ≤
    * `maxPiece` of every distinct word, keyed by (piece, word-INITIAL
    * vs continuation), occurrence-weighted by word count; pieces with
    * mass ≥ `minCount` survive, and ALL single characters survive
    * unconditionally so greedy encoding is total (no [UNK] path).
    * Returns (piece, initial: boolean).
    *
    * Shape: the substring enumeration is over the DISTINCT-WORD frame
    * (≤ len·maxPiece rows per word), never the corpus — the same
    * vocabulary-collapse posture as [[learn]]. */
  def wordpieceVocab(wordCounts: DataFrame, maxPiece: Int,
                     minCount: Long): DataFrame = {
    require(maxPiece >= 1, s"maxPiece must be >= 1, got $maxPiece")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    wordCounts
      .select(col("word"), col("count"),
        length(col("word")).cast("int").as("__len"))
      .select(col("word"), col("count"),
        explode(sequence(lit(1), col("__len"))).as("s"),
        col("__len"))
      .select(col("word"), col("count"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxPiece), col("__len") - col("s") + 1))).as("l"))
      .select(col("word").substr(col("s"), col("l")).as("piece"),
        (col("s") === 1).as("initial"), col("count"), col("l"))
      .groupBy(col("piece"), col("initial"))
      .agg(sum(col("count")).as("__c"), max(col("l")).as("__l"))
      .filter(col("__c") >= minCount || col("__l") === 1)
      .select(col("piece"), col("initial"))
  }

  /** Greedy longest-match-first segmentation of the distinct-word
    * frame against a [[wordpieceVocab]] table — the WordPiece/BERT
    * encode rule: at each position take the LONGEST vocabulary piece
    * (word-initial pieces at position 1, `##`-class continuations
    * after), advance past it, repeat. Totality: single characters are
    * always in the vocab, so the longest match is ≥ 1 and the
    * segmentation consumes every word exactly.
    *
    * Returns (word, count, pieces: array<string>) with continuations
    * rendered `##piece` — the word→subword dictionary [[encode]]-style
    * corpus joins consume.
    *
    * Shape: candidate (word, position, length) triples join the
    * broadcast-size vocab; one argmax agg gives the per-position jump
    * table; one sorted collect per word; then ONE higher-order fold
    * walks the jump chain per word — no driver loop, no recursion,
    * work ∝ Σ word lengths over the DISTINCT-word frame. */
  def wordpieceSegment(wordCounts: DataFrame, vocab: DataFrame,
                       maxPiece: Int): DataFrame = {
    val cands = wordCounts
      .select(col("word"), col("count"),
        length(col("word")).cast("int").as("__len"))
      .select(col("word"), col("count"),
        explode(sequence(lit(1), col("__len"))).as("s"),
        col("__len"))
      .select(col("word"), col("count"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxPiece), col("__len") - col("s") + 1))).as("l"))
      .select(col("word"), col("count"), col("s"), col("l"),
        col("word").substr(col("s"), col("l")).as("piece"),
        (col("s") === 1).as("initial"))
    val jumps = cands
      .join(vocab, Seq("piece", "initial"))
      .groupBy(col("word"), col("count"), col("s"))
      .agg(max(col("l")).as("jl"))
    jumps
      .groupBy(col("word"), col("count"))
      .agg(sort_array(collect_list(struct(col("s"), col("jl")))).as("__j"))
      .select(col("word"), col("count"), expr(
        """aggregate(sequence(1, size(__j)),
          |  named_struct('p', 1, 't', CAST(array() AS array<string>)),
          |  (acc, i) -> IF(i = acc.p,
          |    named_struct(
          |      'p', CAST(acc.p + __j[i-1].jl AS INT),
          |      't', concat(acc.t, array(IF(i = 1,
          |        substring(word, i, CAST(__j[i-1].jl AS INT)),
          |        concat('##',
          |          substring(word, i, CAST(__j[i-1].jl AS INT))))))),
          |    acc),
          |  acc -> acc.t)""".stripMargin).as("pieces"))
  }
}
