package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution operators: exact edit-distance similarity join
  * over a string catalog (the "merge these near-identical product /
  * vendor / author names" cleanup every large catalog needs), built
  * on segment filtering (PassJoin; Li, Deng, Wang & Feng, PVLDB'11 —
  * public literature), NOT heuristic blocking.
  *
  * Why segments and not prefix/length blocking: a pair within edit
  * distance k can disagree in its first AND last characters, so
  * prefix/suffix blocking silently loses recall; length-band blocking
  * alone degenerates to O(V²) inside a band. The pigeonhole fact
  * behind PassJoin is loss-free: split a string into k+1 segments —
  * any string within edit distance k aligns at least one segment with
  * ZERO errors, so that segment appears verbatim in the other string,
  * shifted by at most k positions (the errors before it). Candidate
  * generation therefore joins indexed segments against enumerated
  * probe substrings on (content, segment#, indexed length) — a plain
  * hash-shuffle join keyed on short substrings — and misses nothing.
  *
  * 100 TB posture: per string the probe side enumerates at most
  * (2k+1)·(k+1)·(2k+1) substrings (k=2 → 75) — linear in the catalog,
  * never all-pairs. The join key includes the segment INDEX and the
  * indexed string's LENGTH, which splits common-substring buckets the
  * way LSH bands split shingle buckets; verification is the banded
  * O(k·n) [[functions.levenshtein]] with an early-exit threshold, on
  * candidates only. Catalog strings are deduplicated up front, so the
  * join runs on distinct names with multiplicities carried as counts
  * (the vocab-bounded frame, not the row frame).
  *
  * ASCII/BMP note: `length`/`substring` count characters identically
  * in Spark and DuckDB for BMP text; the synthetic fixtures are ASCII.
  */
object Er {

  /** Segment start (1-based) for segment `i` of a length-`l` string
    * split into k+1 segments, even partition: the first (k+1 − l mod
    * (k+1)) segments get ⌊l/(k+1)⌋ chars, the rest one more. */
  private def segStart(i: Column, l: Column, k: Int): Column = {
    val m = lit(k + 1)
    val q = (l / m).cast("long")
    val r = l % m
    when(i < m - r, i * q).otherwise((m - r) * q + (i - (m - r)) * (q + 1)) +
      lit(1)
  }

  /** Segment length for segment `i` of a length-`l` string. */
  private def segLen(i: Column, l: Column, k: Int): Column = {
    val m = lit(k + 1)
    (l / m).cast("long") + when(i >= m - (l % m), 1L).otherwise(0L)
  }

  /** Exact edit-distance similarity self-join: every unordered pair
    * of DISTINCT values of `strCol` with levenshtein distance in
    * [1, k], with the pair's row multiplicities. Returns (name_a,
    * name_b, dist, n_a, n_b) with name_a < name_b — exact and
    * complete (no blocking recall loss; the completeness law is
    * asserted against a brute-force all-pairs join in ErSpec).
    *
    * Strings shorter than k+1 characters cannot host k+1 non-empty
    * segments; they can only be within k of strings no longer than
    * 2k, so the (tiny, alphabet-bounded) short pool is paired against
    * that bounded pool directly and unioned in — completeness holds
    * for every length. */
  def editJoin(df: DataFrame, strCol: String, k: Int): DataFrame = {
    require(k >= 1, s"edit-distance threshold k must be >= 1, got $k")
    val strs = df.groupBy(col(strCol).as("s"))
      .agg(count(lit(1)).as("n"))
      .select(col("s"), col("n"), length(col("s")).cast("long").as("l"))
    val longs = strs.filter(col("l") >= k + 1)

    // index side: the k+1 segments of every long string
    val segs = longs
      .select(col("s").as("sb"), col("l").as("lb"),
        explode(sequence(lit(0L), lit(k.toLong))).as("i"))
      .select(col("sb"), col("lb"), col("i"),
        col("sb").substr(segStart(col("i"), col("lb"), k),
          segLen(col("i"), col("lb"), k)).as("seg"))

    // probe side: for each candidate indexed length l2 ∈ [l−k, l+k]
    // (≥ k+1), each segment slot, each shift d ∈ [−k, k], the probe
    // substring at the segment's position-in-l2 plus d — deduplicated
    // on the join key before the shuffle.
    val probes = longs
      .select(col("s").as("sa"), col("l").as("la"),
        explode(sequence(lit(-k.toLong), lit(k.toLong))).as("dl"))
      .withColumn("l2", col("la") + col("dl"))
      .filter(col("l2") >= k + 1)
      .select(col("sa"), col("la"), col("l2"),
        explode(sequence(lit(0L), lit(k.toLong))).as("i"))
      .select(col("sa"), col("la"), col("l2"), col("i"),
        explode(sequence(lit(-k.toLong), lit(k.toLong))).as("d"))
      .withColumn("pst", segStart(col("i"), col("l2"), k) + col("d"))
      .withColumn("pln", segLen(col("i"), col("l2"), k))
      .filter(col("pst") >= 1 && col("pst") <= col("la") - col("pln") + 1)
      .select(col("sa"), col("l2"), col("i"),
        col("sa").substr(col("pst"), col("pln")).as("seg"))
      .distinct()

    val candLong = probes.join(segs,
        probes("seg") === segs("seg") && probes("i") === segs("i") &&
          probes("l2") === segs("lb") && probes("sa") =!= segs("sb"))
      .select(col("sa"), col("sb"))

    // short pool: strings of length ≤ k vs the (≤ 2k)-length pool —
    // both alphabet-bounded, broadcast on the short side.
    val shorts = strs.filter(col("l") <= k).select(col("s").as("sa"))
    val pool = strs.filter(col("l") <= 2L * k).select(col("s").as("sb"))
    val candShort = broadcast(shorts).crossJoin(pool)
      .filter(col("sa") =!= col("sb"))

    val cands = candLong.union(candShort)
      .select(least(col("sa"), col("sb")).as("name_a"),
        greatest(col("sa"), col("sb")).as("name_b"))
      .distinct()

    val verified = cands
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), k).cast("long"))
      .filter(col("dist") >= 1 && col("dist") <= k)
    val dims = strs.select(col("s"), col("n"))
    verified
      .join(broadcast(dims).withColumnRenamed("s", "name_a")
        .withColumnRenamed("n", "n_a"), Seq("name_a"))
      .join(broadcast(dims).withColumnRenamed("s", "name_b")
        .withColumnRenamed("n", "n_b"), Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"),
        col("n_b"))
  }

  /** End-to-end entity resolution over a string catalog: the
    * [[editJoin]] match graph closed TRANSITIVELY into entity clusters
    * (connected components — "bolt"~"bolts"~"bolt s" merge even when
    * the endpoints exceed k), with the survivorship policy catalogs
    * actually use: the canonical form of an entity is its most
    * frequent variant (row multiplicity), ties to the lexicographically
    * smallest — deterministic, no "first seen wins".
    *
    * Returns one row per DISTINCT value of `strCol`: (name, n_rows,
    * canonical, n_variants, cluster_rows) — the rewrite table a
    * normalization pass joins on (name → canonical), with the audit
    * columns (how big is the entity, how much mass moves) in the same
    * frame. Unmatched names are their own canonical (n_variants = 1).
    *
    * 100 TB posture: every stage is vocab-bounded — candidate pairs
    * from the loss-free segment join, components via the same
    * path-halving label propagation the near-dup clusterer uses
    * ([[Dedup.nearDupClusters]]; checkpoint-barriered, ~log2(diameter)
    * rounds), survivorship one agg + one window over the distinct-name
    * frame. The row frame is touched only by the caller's final join. */
  def resolveEntities(df: DataFrame, strCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val strs = df.groupBy(col(strCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
    val pairs = editJoin(df, strCol, k)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val clusters = Dedup.nearDupClusters(pairs, "name")
    val labeled = strs.join(clusters, Seq("name"), "left")
      .select(col("name"), col("n_rows"),
        coalesce(col("cluster_rep"), col("name")).as("__rep"))
    // survivor per component: max multiplicity, tie min name — one
    // window pass over the component partition (bounded: one row per
    // distinct name), deterministic by the full order-by
    val wOrd = Window.partitionBy(col("__rep"))
      .orderBy(col("n_rows").desc, col("name"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAll = Window.partitionBy(col("__rep"))
    labeled.select(col("name"), col("n_rows"),
      first(col("name")).over(wOrd).as("canonical"),
      count(lit(1)).over(wAll).as("n_variants"),
      sum(col("n_rows")).over(wAll).as("cluster_rows"))
  }
}
