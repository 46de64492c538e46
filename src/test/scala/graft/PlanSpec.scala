package graft

import org.apache.spark.sql.functions._

/** Plan-quality assertions — the 100 TB posture is only real if the
  * physical plans show it: pruned scans, pushed filters, broadcast
  * dictionary joins, no cartesian products, codegen'd hot paths. */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: scan pruned to referenced columns only") {
    val p = plan("q1_pricing_summary")
    val scan = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(scan.contains("l_returnflag") && scan.contains("l_quantity"))
    assert(!scan.contains("l_shipdate") && !scan.contains("l_partkey"),
      s"unpruned scan: $scan")
  }

  test("q16: probe filter pushed down to the parquet scan") {
    val p = plan("q16_cosine_topk")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]")
      || p.contains("LessThan(vec_id,5)"), p)
  }

  test("q14: dictionary joins are broadcast hash joins, fact never shuffles for them") {
    val p = plan("q14_copurchase_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q44: dims broadcast, facts hash-join, never cartesian") {
    val p = plan("q44_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q48: as-of join is union + keyed window, never a range/cartesian join") {
    val p = plan("q48_asof_enrich")
    assert(p.contains("Union"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q54: interval join keys on user_id with the range as residual, never nested-loop") {
    val p = plan("q54_interval_join")
    // the equi-predicate must drive join selection (hash or sort-merge on
    // user_id); the time-range condition rides along as the residual — a
    // nested-loop/cartesian here would be all-pairs-per-batch at scale
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q55: exact-Jaccard inverted-index join is equi-keyed, never nested-loop") {
    val p = plan("q55_jaccard_exact")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the posting list is checkpointed — downstream must read the
    // materialized RDD, not re-derive the shingle HOF per branch
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"), p)
  }

  test("q56: topKeywords tokenizes the corpus exactly once") {
    // df is a window count over the tf frame, never an idfTable join —
    // the join form re-tokenized the corpus for the second side (and
    // column pruning defeats exchange reuse between the two branches)
    val p = plan("q56_top_keywords")
    val tokenizations = "Generate explode".r.findAllIn(p).size
    assert(tokenizations == 1, s"corpus tokenized $tokenizations times:\n$p")
  }

  test("q57: funnel counts read only checkpointed reach frames (no event re-scan)") {
    val p = plan("q57_funnel")
    // the funnel materializes its stage chain behind barriers at build
    // time; the final union must contain ZERO scans of the events table
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"), p)
    val evScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("events"))
    assert(evScans == 0, s"funnel union re-scans events $evScans times:\n$p")
  }

  test("q61: contamination joins the broadcast eval posting list (train never shuffles for it)") {
    val p = plan("q61_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q50: bucketed as-of join shuffles raw rows by (key, time-bucket), not key alone") {
    val p = plan("q50_asof_bucketed")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the within-bucket window's exchange must carry the bucket column —
    // per-key work splits across buckets (parallelism ∝ key × bucket);
    // without it the plan regressed to q48's one-task-per-key sort
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("__b")), p)
  }

  test("q52: bucketed sessionize sorts raw events by (user, time-bucket)") {
    val p = plan("q52_sessionize_bucketed")
    // phase-1 window exchange carries the bucket — a hot user's timeline
    // splits across tasks instead of sorting in one (the q30 caveat)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("user_id")
        && l.contains("__b")), p)
  }

  test("q10: pair pipeline has exactly one fact-table shuffle (the basket groupBy)") {
    val p = plan("q10_skipgram_cooc")
    // exchanges: basket groupBy + final cooc agg + tiny vocab topK/window +
    // broadcast build — but NO join-driven exchange pair (sort-merge join
    // would add two). SortMergeJoin must not appear at all.
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("aggregations are partial+final hash aggregates (map-side combine)") {
    val p = plan("q2_vocab_topk")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("q2: top-K vocab is TakeOrdered, not a full sort") {
    assert(plan("q2_vocab_topk").contains("TakeOrderedAndProject"))
  }

  test("dedup/ann queries never fall back to nested-loop or cartesian joins") {
    Seq("q20_lsh_near_pairs", "q22_simhash_pairs", "q23_embed_near_pairs",
      "q28_ann_topk").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("hash-dense operators stay inside whole-stage codegen") {
    // execute THIS dataframe (not a derived count) so AQE finalizes the
    // plan — pre-execution it prints isFinalPlan=false without codegen
    // markers
    val df = SparkEntry.queries("q19_minhash_sig")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(")) // fused codegen stages present
  }

  test("SRP/cosine hot paths carry no interpreted lambda over the vector column") {
    // srpBuckets emits one codegen'd FoldDot per plane against literal
    // weights, and cosine consumes the raw float arrays — if aggregate/
    // zip_with/transform lambdas reappear here, the projection went back
    // to interpreted evaluation (~5-10x on q23/q28)
    Seq("q23_embed_near_pairs", "q28_ann_topk").foreach { q =>
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("lambdafunction"), s"$q: interpreted lambda in plan")
    }
  }

  test("q58: tokenization is materialized once, not inlined in the gram lambda") {
    // split(text) must appear exactly once (its own projection): inlined
    // into the transform it re-evaluates per element_at — 2n× per gram
    // (measured 3.6× the whole query at sf0.1)
    val p = SparkEntry.queries("q58_repetition")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits == 1, s"split() appears $splits times:\n$p")
  }

  test("q63: THREE n-gram sizes still tokenize the corpus exactly once") {
    // repetitionStatsMulti tags each n's gram array inside one projection
    // and explodes the concatenation — per-n call forms would pay one
    // split+explode pass per n
    val p = SparkEntry.queries("q63_repetition_multi")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits == 1, s"split() appears $splits times:\n$p")
  }

  test("q71: one tokenizing explode; the token-count scan stays map-only") {
    // the corpus-wide per-token count is a window sum over the tf frame
    // (a join against a unigram table would re-tokenize the second side);
    // the only other split() is the total-token scalar — a 1-row agg of
    // size(split(...)), no explode, no shuffle
    val p = SparkEntry.queries("q71_unigram_nll")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits == 2, s"split() appears $splits times:\n$p")
    val explodes = "(?i)explode".r.findAllIn(p).size
    assert(explodes == 1, s"explode appears $explodes times:\n$p")
  }

  test("q72: gram df is a window over the grouped frame — one tokenization") {
    val p = SparkEntry.queries("q72_boilerplate")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits == 1, s"split() appears $splits times:\n$p")
  }

  test("q73: centroid fan-out broadcasts; the pair join is cluster-equi-keyed") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // the assignment stage (pre-barrier): its only cartesian shape is
    // the broadcast against the k-row centroid frame
    val ap = graft.ops.Dedup.semanticAssign(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < SparkEntry.SemClusters))
      .queryExecution.executedPlan.toString
    assert(!ap.contains("CartesianProduct"), s"cartesian in plan:\n$ap")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(ap).size
    assert(bnlj == 1, s"expected 1 broadcast fan-out, got $bnlj:\n$ap")
    // the full query (post-barrier): within-cluster pair join + anti
    // join are equi-keyed — never a loop over the corpus
    val p = SparkEntry.queries("q73_semantic_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join in plan:\n$p")
  }

  test("q74: weight spine broadcasts into the scoring join; 3 tokenizations") {
    val df = SparkEntry.queries("q74_dsir_score")(spark, dir)
    val op = df.queryExecution.optimizedPlan.toString
    // target counts, raw counts, scoring pass — and nothing more (the
    // weight math itself must never touch the corpus again)
    val splits = "split\\(".r.findAllIn(op).size
    assert(splits == 3, s"split() appears $splits times:\n$op")
    val ep = df.queryExecution.executedPlan.toString
    assert(!ep.contains("CartesianProduct") &&
      !ep.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$ep")
    // the buckets-row weight frame reaches the gram stream as a
    // broadcast hash join, not a shuffle of the occurrences
    assert(ep.contains("BroadcastHashJoin"), s"no broadcast join:\n$ep")
  }

  test("q100: centroids broadcast into the scoring join; corpus rows never shuffle for it") {
    val p = plan("q100_label_prototypes")
    // the labels×dim centroid frame reaches the code stream as a
    // broadcast hash join — a shuffled join here would move the corpus
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
  }

  test("q101: percent_rank windows run over the grouped frame, never a corpus partition") {
    val df = SparkEntry.queries("q101_quality_percentiles")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // every Window sits above a HashAggregate output (the compact
    // (source, score) frame) — the raw document relation must never be
    // a window child. The plan prints operators top-down, so if a scan
    // appeared between a Window and its aggregate the ordering breaks.
    val lines = p.linesIterator.toSeq
    val winIdx = lines.zipWithIndex.filter(_._1.contains("Window")).map(_._2)
    assert(winIdx.nonEmpty, s"no window in plan:\n$p")
    winIdx.foreach { i =>
      val below = lines.drop(i + 1)
      val agg = below.indexWhere(_.contains("HashAggregate"))
      val scan = below.indexWhere(_.contains("FileScan"))
      assert(agg >= 0 && (scan < 0 || agg < scan),
        s"window at line $i not over an aggregated frame:\n$p")
    }
  }

  test("q103: drift arithmetic runs over the checkpointed count frame, never re-tokenizes") {
    val df = SparkEntry.queries("q103_unigram_drift")(spark, dir)
    // the joined (w, ca, cb) frame is materialized behind a Barrier at
    // construction, so the returned plan must contain NO tokenizing
    // split at all — the totals agg and the scoring both read the
    // compact checkpointed frame
    val op = df.queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(op).size
    assert(splits == 0, s"split() appears $splits times:\n$op")
    assert(op.contains("LogicalRDD") || op.contains("ExistingRDD"),
      s"no checkpoint source in plan:\n$op")
    val ep = df.queryExecution.executedPlan.toString
    assert(!ep.contains("CartesianProduct"), s"cartesian in plan:\n$ep")
    // the only loop-shaped join is the broadcast of the 1-row totals
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(ep).size
    assert(bnlj <= 1, s"expected at most the 1-row totals broadcast:\n$ep")
    // top-k is TakeOrdered, never a full global sort
    assert(ep.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$ep")
  }

  test("q64: domain mix broadcasts the rate spec, corpus never shuffles for it") {
    val p = plan("q64_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q66: bucketed token budget sorts raw docs by (source, priority-bucket)") {
    // the within-bucket window's exchange must carry the bucket — a hot
    // source's document list splits across tasks instead of sorting in
    // one (the q65 caveat)
    val p = plan("q66_token_budget_bucketed")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("source")
        && l.contains("__b")), p)
  }

  test("q67: packing exchanges carry the shard key; no cartesian reassembly") {
    val p = plan("q67_pack_sequences")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("shard")), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q68: incremental dedup joins are equi-keyed, never nested-loop") {
    val p = plan("q68_dedup_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q112: blocklist report is join-free — the list lives in the projection") {
    val p = plan("q112_blocklist")
    // map-only contract: membership is array arithmetic over the row's
    // own tokens; any Join here means the literal-list form regressed
    // to a term-table join
    assert(!p.contains("Join"), p)
  }

  test("q114: epoch realization broadcasts the plan; the corpus never sort-merge-joins") {
    val p = plan("q114_epoch_realize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q110: lexical diversity aggregates with map-side partials, no pairwise join") {
    val p = plan("q110_lexical_diversity")
    // the (source, token) count must partial-aggregate before its
    // exchange — hot stopwords combine map-side, no single-key hotspot
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q108: coverage audit broadcasts the eval spine (train never shuffles for it)") {
    val p = plan("q108_contamination_coverage")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q105: Bloom prefilter gates the anti-join map-side (codegen'd might_contain)") {
    val p = plan("q105_dedup_bloom")
    // the definitely-new branch and the verify branch both filter on the
    // Bloom predicate BEFORE any exchange — batch rows the sketch
    // rejects never shuffle; the membership test is the codegen'd
    // BloomFilterMightContain expression, not a UDF
    assert(p.contains("might_contain"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q78: span-scrub joins equi-keyed; canonical-occurrence min is partial") {
    // post-barrier plan: the dup-gram groupBy must be a map-side-
    // combinable min (absorbs mega-repeated-span skew) and every join
    // (hash join-back, semi on dirty docs, anti on removed idx) stays
    // hash-keyed — a nested loop here would be corpus-pairwise
    val p = plan("q78_scrub_spans")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial"), p)
  }

  test("q79: bigram corpus tables are windows over the compact (v,w) frame") {
    // post-barrier: the (doc,v,w) cut joins the corpus-level frame; the
    // total-token scalar broadcasts (1-row, the only NLJ allowed); no
    // cartesian, and the per-doc frame never windows directly (the
    // hot-stopword partition trap)
    val p = plan("q79_bigram_nll")
    assert(!p.contains("CartesianProduct"), p)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj == 1, s"want exactly the 1-row total broadcast, got $nlj:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q121: the d x w sketch broadcasts into the estimate join; no sort-merge") {
    val p = plan("q121_cms_audit")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q122: no-split packing exchanges once, on the group key only") {
    val p = plan("q122_pack_whole")
    // exactly one hash exchange: groupByKey's shard key (typed, so it
    // shows as `value`) feeding the sorted group scan — no corpus-wide
    // doc_id sort, no second shuffle
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.length == 1,
      s"want the single shard exchange:\n${exchanges.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q125: phash audit decodes the payload once; band join equi-keyed") {
    val p = plan("q125_media_phash_audit")
    // the banded self-join must key on (band, bv) — never nested-loop,
    // never a pairwise scan
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the fingerprint frame is cut behind the audit's barrier, so the
    // payload decode (the aHash aggregate) runs in ONE scan — both join
    // sides read the cached 16-byte/doc frame
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(scans <= 1, s"documents scanned $scans times:\n$p")
    // with the cut in place the join sides read the materialized frame
    // (ExistingRDD under the local barrier, cache/checkpoint scan in
    // reliable mode) — never a second parquet scan
  }

  test("q126: zipf fit input is a distributed top-k, never a vocab-wide sort") {
    val p = plan("q126_zipf_audit")
    // the fit frame must come from TakeOrderedAndProject (bounded at
    // fitTopK rows at any corpus scale); a global Sort before the rank
    // window would be a vocab-sized single-partition sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q127: ICT pair extraction is map-only — no exchange at any scale") {
    val p = plan("q127_ict_pairs")
    // tokenize → hash → slice → rejoin, all per-row; the only allowed
    // exchange is the output orderBy's range partitioning
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    val range = p.linesIterator.count(l =>
      l.trim.startsWith("Exchange rangepartitioning"))
    assert(exchanges == range,
      s"non-sort exchange in a map-only op ($exchanges vs $range):\n$p")
  }

  test("q130: source matrix joins are equi-keyed, never nested-loop") {
    val p = plan("q130_dup_source_matrix")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q133: anomaly report is join-free — one count agg + one per-type window") {
    val p = plan("q133_window_anomaly")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q135: CDC chunker pays one doc-keyed shuffle for lag+cumsum+rollup") {
    val p = plan("q135_chunks_cdc")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Join"), p)
    // the boundary lag and the running chunk index share one window
    // spec — a second hashpartitioning exchange on doc_id would mean
    // the window split
    val docExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id"))
    assert(docExchanges == 1, s"expected 1 doc-keyed exchange:\n$p")
  }

  test("q134: interleave broadcasts the weight spec; corpus never sort-merges for it") {
    val p = plan("q134_interleave")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q138: transition matrix is join-free — lag window + matrix agg only") {
    val p = plan("q138_transition_matrix")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q140: incremental chunk scrub anti-joins equi on the hash, never nested-loop") {
    val p = plan("q140_chunk_scrub_incr")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q161: exact margin mining broadcasts the Y side; windows are " +
      "keyed, never a global sort; no nested-loop beyond the one " +
      "intended broadcast cross join") {
    val p = plan("q161_margin_mining")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // every Window is partitioned (x_id/y_id), no Window over unkeyed sort
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]")), p)
  }

  test("q162: bucketed margin mining never broadcasts a corpus side — " +
      "the candidate join is equi-keyed on the bucket code") {
    val p = plan("q162_margin_mining_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q163: HLL registers shuffle only (key, bucket) partials — " +
      "partial_max before the exchange, no distinct on the token stream") {
    val p = plan("q163_hll_audit")
    // map-side combine on the register agg: a partial max appears
    // below the shuffle
    assert(p.contains("partial_max") || p.contains("partial max"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166: codebooks and the ADC distance table ride broadcast " +
      "exchanges; no unintended cartesian product") {
    val p = plan("q166_pq_recall")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169: the co-occurrence model meets the eval contexts through " +
      "an equi join; every window is keyed on the eval order") {
    val p = plan("q169_rec_eval")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]")), p)
  }

  test("q175: BM25 tokenizes each side once; query terms broadcast " +
      "into the posting join") {
    // corpus: ONE exploding tokenization (the tf frame — df and dl are
    // windows over it, never a second-tokenize join) + the map-only
    // size(split()) total scan; queries: one explode. 3 splits, 2
    // explodes total — anything more means a side re-tokenized.
    val p0 = SparkEntry.queries("q175_bm25_topk")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p0).size
    assert(splits == 3, s"split() appears $splits times:\n$p0")
    val explodes = "(?i)explode".r.findAllIn(p0).size
    assert(explodes == 2, s"explode appears $explodes times:\n$p0")
    val p = plan("q175_bm25_topk")
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"query-term join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q177: triangle joins are equi-keyed (src; then (v,w)) — " +
      "never nested-loop, never cartesian") {
    val p = plan("q177_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
  }

  test("q184: the interval lookup is a window merge — exactly one " +
      "nested-loop in the plan (the 1-row total broadcast)") {
    // regression pin for the sf1 finding: a range join between
    // distinct-score frames is O(V²) when 9-dp scores are near-unique
    // (measured 7.2x/decade); the merge form keeps one BNLJ, the
    // 1-row count broadcast
    val p = plan("q184_quantile_norm")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"interval lookup regressed to a range join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q237: the overlap join meets by cell equality — never a " +
      "cartesian or nested-loop range join") {
    val p = plan("q237_overlap_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q228: the bootstrap resample spine rides broadcast; no " +
      "sort-merge join anywhere in the walk") {
    val p = plan("q228_bootstrap_ci")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q230: spearman's rank joins are keyed equi-joins; the only " +
      "nested-loops are 1-row broadcasts") {
    val p = plan("q230_spearman")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q238/q229: graph fixpoints join equi-keyed; totals broadcast; " +
      "never cartesian") {
    Seq("q238_hits", "q229_kcore").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin") || q == "q229_kcore", s"$q:\n$p")
    }
  }

  test("q235: attribution windows are user-partitioned — no global " +
      "single-partition window over the event log") {
    val p = plan("q235_touch_attribution")
    val eventWindows = p.linesIterator.filter(l =>
      l.trim.startsWith("Window") && l.contains("_we0")).toSeq
    // every Window over raw events must carry a partition spec
    p.linesIterator.filter(_.trim.startsWith("Window")).foreach { l =>
      assert(l.contains("user_id"), s"unpartitioned window: $l")
    }
    assert(eventWindows.isEmpty || eventWindows.forall(_.contains("user_id")))
  }

  test("q254: robust-anomaly windows are type-partitioned — no " +
      "global single-partition window over the counts") {
    val p = plan("q254_window_anomaly_robust")
    p.linesIterator.filter(_.trim.startsWith("Window")).foreach { l =>
      assert(l.contains("event_type"), s"unpartitioned window: $l")
    }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q252: the anisotropy walk never cartesians anything " +
      "corpus-sized — only 1-row broadcast scalars") {
    // the d x d matrix frames may sort-merge join among themselves
    // (report-sized); what must never appear is a cartesian product
    val p = plan("q252_anisotropy")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("generate does not re-derive hash trees below the projection") {
    // the InferFiltersFromGenerate + pushdown pathology (see q19/q27
    // comments): if it regresses, hash60 shows up inside a Filter over
    // the raw text scan and these counts explode
    Seq("q19_minhash_sig", "q27_fingerprints").foreach { q =>
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      val inFilters = p.linesIterator
        .filter(_.trim.startsWith("Filter"))
        .map(l => "hash60".r.findAllIn(l).size).sum
      assert(inFilters == 0, s"$q: hash60 re-derived in a Filter ($inFilters times)")
    }
  }
}
