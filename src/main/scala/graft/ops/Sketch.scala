package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) over the corpus
  * token stream — the sub-linear-state twin of the exact frequency
  * aggregation ([[Vocab]] top-K, `data_prep.py:120-135`'s counter).
  *
  * The exact count shuffles one row per DISTINCT token; at 100 TB the
  * distinct-token universe (URLs, ids, typos) is itself huge and
  * skewed. The sketch shuffles at most `depth × width` counter cells
  * per map partition regardless of corpus size — frequency estimation
  * whose shuffle volume is a CONSTANT chosen up front (ε = e/width
  * relative error, δ = e^−depth failure probability), which is how a
  * streaming/heavy-hitter path sizes its state.
  *
  * Every hash is [[Portable]] keyed (row index + token), so the sketch
  * is bit-reproducible across runs, partitionings and engines — the
  * DuckDB oracle builds the identical table, and the one-sided CMS
  * guarantee (estimate ≥ true count, always) is a testable law, not a
  * probabilistic claim.
  */
object Sketch {

  /** The d×w counter table: for each depth row r, every token
    * occurrence increments cell (r, hash_r(token) mod width). Output:
    * (r, c, cnt) — at most depth × width rows.
    *
    * Scale shape: explode fans each token into `depth` cells
    * IN-PARTITION; the groupBy's map-side combine collapses them to
    * ≤ depth × width partial rows per map task before the (tiny,
    * bounded) shuffle. Nothing corpus-sized ever moves. */
  def cmsTable(df: DataFrame, textCol: String, depth: Int, width: Int,
               salt: String): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    df.select(explode_outer(Text.tokens(col(textCol))).as("__w"))
      .filter(col("__w").isNotNull)
      .select(col("__w"), explode(lit((0 until depth).toArray)).as("r"))
      .select(col("r"),
        pmod(Portable.seededHash(lit(salt), col("r"), col("__w")),
          lit(width.toLong)).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for candidate tokens: est(t) = min over depth
    * rows of the counter cell t hashes into (missing cell → 0, an
    * exact zero). `candidates` is a one-column frame of tokens to
    * query — at scale the candidate set comes from per-partition local
    * heavy hitters or an external watchlist, NOT a corpus-wide
    * distinct (that would reintroduce the shuffle the sketch avoids).
    * Output: (token, est).
    *
    * Scale shape: the sketch table is ≤ depth × width rows →
    * broadcast; candidates × depth meet it map-side. */
  def cmsEstimates(sketch: DataFrame, candidates: DataFrame,
                   tokenCol: String, depth: Int, width: Int,
                   salt: String): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    candidates
      .select(col(tokenCol), explode(lit((0 until depth).toArray)).as("r"))
      .select(col(tokenCol), col("r"),
        pmod(Portable.seededHash(lit(salt), col("r"), col(tokenCol)),
          lit(width.toLong)).as("c"))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy-hitter audit: every token whose TRUE corpus frequency is
    * ≥ `minCount`, with its sketch estimate alongside — the
    * commissioning report that validates a (depth, width) choice
    * before the sketch path is trusted at scale. Output:
    * (token, exact, est, overestimate = est − exact ≥ 0; the CMS
    * one-sided error law, pinned by SketchSpec for EVERY token).
    *
    * This audit intentionally pays the exact token-keyed aggregation
    * (it is the ground truth being compared against) — run it on a
    * sample or at commissioning time; the steady-state path is
    * [[cmsTable]] + [[cmsEstimates]] alone. */
  def heavyHitterAudit(df: DataFrame, textCol: String, depth: Int,
                       width: Int, minCount: Long, salt: String): DataFrame = {
    val exact = df
      .select(explode_outer(Text.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .filter(col("exact") >= minCount)
    val sketch = cmsTable(df, textCol, depth, width, salt)
    cmsEstimates(sketch, exact.select(col("token")), "token",
        depth, width, salt)
      .join(exact, Seq("token"))
      .select(col("token"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overestimate"))
  }
}
