package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * The reference's stochastic operators (basket shuffle `data_prep.py:156`,
  * subsampling `data_prep.py:150-151`, negative sampling
  * `data_prep.py:173-186`) use RNG state that can never be reproduced by an
  * independent engine. We replace RNG draws with a *keyed hash*: every
  * random decision is a pure function of the row's identity, so results are
  * bit-for-bit reproducible across runs, partitionings, cluster sizes — and
  * across engines (the DuckDB oracle computes the identical value with the
  * identical SQL shape).
  *
  * The hash is the first 15 hex digits (60 bits) of md5 — md5 is the one
  * cryptographic hash both Spark and DuckDB expose with identical string
  * semantics. 60 bits keeps the value positive in an INT64 in both engines.
  *
  * Spark-side the value is computed by [[graft.functions.Hash60]], a
  * native codegen'd expression producing the long straight from the
  * digest bytes (no hex string / base-16 parse); the composed built-in
  * chain it replaces lives on as [[composedSeededHash]], and a spec pins
  * their equality. The DuckDB oracle keeps the composed SQL form.
  */
object Portable {

  /** 2^60 as a double — divisor that maps the 60-bit hash to [0, 1). */
  val TwoPow60: Double = 1152921504606846976.0

  /** Key separator — must equal the `chr(1)` separator in [[sqlHash]]
    * so Spark and DuckDB hash identical byte streams. Written as a
    * unicode escape (NOT a raw control char) so editors/diff tooling
    * can never silently strip or normalize it. */
  private val Sep = "\u0001"

  /** 60-bit non-negative hash of the concatenated key columns.
    * DuckDB equivalent: [[sqlHash]]. */
  def seededHash(cols: Column*): Column =
    graft.functions.Hash60(cols: _*)

  /** The built-in-function composition [[seededHash]] replaced — kept as
    * the reference implementation the Hash60 spec checks the native
    * expression against. */
  def composedSeededHash(cols: Column*): Column =
    conv(substring(md5(concat_ws(Sep, cols.map(_.cast("string")): _*)), 1, 15),
      16, 10).cast("long")

  /** Uniform [0,1) draw keyed by the given columns. DuckDB: [[sqlUnif]]. */
  def unif(cols: Column*): Column =
    seededHash(cols: _*) / lit(TwoPow60)

  /** DuckDB SQL fragment computing the same 60-bit hash; `keys` are SQL
    * expressions of string or integer type. */
  def sqlHash(keys: String*): String =
    s"CAST(('0x' || substring(md5(concat_ws(chr(1), " +
      keys.map(k => s"CAST($k AS VARCHAR)").mkString(", ") +
      ")), 1, 15)) AS BIGINT)"

  /** DuckDB SQL fragment for the uniform [0,1) draw. */
  def sqlUnif(keys: String*): String =
    s"(${sqlHash(keys: _*)} / 1152921504606846976.0)"

  /** Engine-portable emission of a rounded double ratio: integerize
    * the 9dp-rounded value at 1e9 — the floor(·+0.5) absorbs sub-ulp
    * drift between engines' round() implementations — then ONE IEEE
    * division by the 1e9 literal (correctly rounded, so the emitted
    * bit pattern is identical in any engine holding the same exact
    * integer). NULL-safe (NULL in → NULL out); the input must be
    * FINITE — guard zero denominators OUTSIDE with when(), because an
    * ANSI cast of Infinity/NaN to long throws. DuckDB mirror:
    * [[sqlRatio9]].
    *
    * SCOPE (post round-11 audit): because the inner round(x, 9) is
    * still engine-version-sensitive when x sits within an ulp of a
    * half-way point (the q218/q219 driver hash-fail class), every
    * ratio whose operands are EXACT INTEGERS emits via [[intRatio9]]/
    * [[intRatioScaled]] instead. The call sites that remain on
    * ratio9/ratioAt are exactly: (a) genuinely-float chains —
    * ln/exp/sqrt/pow/percentile (IEEE sqrt is correctly rounded; the
    * log family integerizes per TERM before summing), (b) divisions
    * of double LITERALS (mixture-weight shares), and (c) the
    * zipf/heaps r² fits, whose exact rational needs more than 38
    * digits — past both engines' 128-bit integer range. Each is one
    * pinned double chain over exact integers. */
  def ratio9(x: Column): Column = ratioAt(x, 9)

  /** [[ratio9]] at an arbitrary decimal precision (e.g. the 6dp
    * sketch-audit columns). */
  def ratioAt(x: Column, dp: Int): Column = {
    val s = math.pow(10.0, dp.toDouble)
    round(floor(round(x, dp) * lit(s) + lit(0.5)).cast("long")
      .cast("double") / lit(s), dp)
  }

  /** DuckDB SQL mirror of [[ratio9]]; `x` is a SQL DOUBLE expression. */
  def sqlRatio9(x: String): String = sqlRatioAt(x, 9)

  /** DuckDB SQL mirror of [[ratioAt]]. */
  def sqlRatioAt(x: String, dp: Int): String =
    s"round(CAST(CAST(floor(round($x, $dp) * 1e$dp + 0.5) AS BIGINT)" +
      s" AS DOUBLE) / 1e$dp, $dp)"

  /** Exact 9-dp ratio of two exact NONNEGATIVE integers, computed
    * entirely in integer arithmetic: round-half-up at 1e9 via
    * `(2·num·1e9 + den) div (2·den)` carried in DECIMAL(38,0), then
    * ONE IEEE division by the 1e9 literal. Headroom: DECIMAL(38,0)
    * caps `num` at ~5e28 and `den` at ~5e37 — no LINEAR count/sum of
    * row-level integers overflows it at any corpus size, but a caller
    * that SQUARES a scaled operand first (numerator ~(n·1e9)²) hits
    * the cap near n ≈ 2e5 and must bound-check its inputs
    * ([[graft.ops.Quality.brierDecomposition]]'s operand-bound
    * contract is the model; under non-ANSI Spark the overflow would
    * otherwise be a silent NULL). Unlike [[ratio9]] there is NO double `round()` anywhere:
    * `round(<raw double quotient>, 9)` is oracle-engine-VERSION-
    * sensitive (the q218/q219 driver hash-fail class, rounds 9–10) —
    * two engines' round() can land one decimal step apart when the
    * quotient sits within an ulp of a half-way point. Integer div plus
    * one correctly-rounded IEEE division is bit-identical in any
    * engine holding the same exact integers. Caller guards `den > 0`
    * with a short-circuiting when() (ANSI throws on zero). DuckDB
    * mirror: [[sqlIntRatio9]]. */
  def intRatio9(num: Column, den: Column): Column = intRatioAt(num, den, 9)

  /** [[intRatio9]] at an arbitrary decimal precision. */
  def intRatioAt(num: Column, den: Column, dp: Int): Column =
    intRatioScaled(num, den, dp).cast("double") /
      lit(math.pow(10.0, dp.toDouble))

  /** The scaled integer itself — round-half-up of `num·10^dp / den`
    * as a LONG — the form argmaxes and tie-breaks should compare
    * ([[graft.ops.Quality.thresholdSweepFromCounts]]'s `__f19`).
    * DuckDB mirror: [[sqlIntRatioScaled]]. */
  def intRatioScaled(num: Column, den: Column, dp: Int): Column = {
    val s = math.pow(10.0, dp.toDouble).toLong
    val dec = "decimal(38,0)"
    idiv(num.cast(dec) * lit(2L * s) + den.cast(dec),
      den.cast(dec) * lit(2L))
  }

  /** Catalyst IntegralDivide lifted to the Column API (Spark exposes
    * it only as the SQL `div` operator) — exact integral division of
    * LONG/DECIMAL operands returning LONG. */
  private def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** [[intRatio9]] for a possibly-NEGATIVE numerator (den > 0):
    * round-half-up on the magnitude, sign reapplied — sidesteps the
    * engines' differing negative integer-division conventions
    * (Catalyst IntegralDivide truncates toward zero, DuckDB `//`
    * floors). */
  def intRatioSigned9(num: Column, den: Column): Column = {
    val n = num.cast("decimal(38,0)")
    when(n >= 0, intRatio9(n, den)).otherwise(-intRatio9(-n, den))
  }

  /** [[intRatioScaled]] for a possibly-negative numerator (den > 0):
    * round-half-up on the magnitude, sign reapplied. */
  def intRatioScaledSigned(num: Column, den: Column, dp: Int): Column = {
    val n = num.cast("decimal(38,0)")
    when(n >= 0, intRatioScaled(n, den, dp))
      .otherwise(-intRatioScaled(-n, den, dp))
  }

  /** DuckDB SQL mirror of [[intRatioScaledSigned]]. */
  def sqlIntRatioScaledSigned(num: String, den: String, dp: Int): String =
    s"(CASE WHEN ($num) >= 0 THEN ${sqlIntRatioScaled(num, den, dp)}" +
      s" ELSE -${sqlIntRatioScaled(s"-($num)", den, dp)} END)"

  /** DuckDB SQL mirror of [[intRatioSigned9]]. */
  def sqlIntRatioSigned9(num: String, den: String): String =
    s"(CASE WHEN ($num) >= 0 THEN ${sqlIntRatio9(num, den)}" +
      s" ELSE -${sqlIntRatio9(s"-($num)", den)} END)"

  /** DuckDB SQL mirror of [[intRatio9]]; `num`/`den` are SQL integer
    * expressions (any width — promoted to HUGEINT). */
  def sqlIntRatio9(num: String, den: String): String =
    sqlIntRatioAt(num, den, 9)

  /** DuckDB SQL mirror of [[intRatioAt]]. */
  def sqlIntRatioAt(num: String, den: String, dp: Int): String =
    s"(CAST(${sqlIntRatioScaled(num, den, dp)} AS DOUBLE) / 1e$dp)"

  /** DuckDB SQL mirror of [[intRatioScaled]] — a BIGINT-ranged
    * HUGEINT. */
  def sqlIntRatioScaled(num: String, den: String, dp: Int): String = {
    val s = "1" + ("0" * dp)
    s"((2 * CAST(($num) AS HUGEINT) * $s + ($den)) // " +
      s"(2 * CAST(($den) AS HUGEINT)))"
  }
}
