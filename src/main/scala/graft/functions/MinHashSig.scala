package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: ONE [[Hash60]] digest per shingle, then
  * `numPerms` cheap universal-hash mixes over that 60-bit base — the
  * classic (a·h + b) mod p permutation family (Carter–Wegman; Broder,
  * "On the resemblance and containment of documents", 1997) with
  * p = 2^61 − 1, evaluated as one tight codegen'd loop per row.
  *
  * Replaces the round-12 kernel, which paid one full MD5 digest per
  * (shingle, permutation) — 16 digests per shingle at 16 perms; the
  * 5M-doc funnel run's thread sampling billed the map side almost
  * entirely to those digests. This form pays exactly one digest per
  * shingle plus numPerms multiply-mod mixes (a few ns each), and it
  * also removes the signature pipeline's explode + groupBy SHUFFLE:
  * the whole signature is computed inside the row's projection, so
  * MinHash→LSH now shuffles only band rows.
  *
  * Portability (the engine's oracle-lockstep discipline,
  * [[graft.ops.Portable]]): the mix is exact 61-bit integer math —
  * `(coefA(p) · h + coefB(p)) mod (2^61 − 1)` — which DuckDB computes
  * bit-identically in HUGEINT; the coefficient constants derive from
  * [[Hash60]] of ("minhash_a", p)/("minhash_b", p) so both engines
  * inline the very same literals (the oracle SQL is generated from
  * [[coefA]]/[[coefB]]). A spec pins the Mersenne-fold fast path
  * against BigInt reference arithmetic.
  *
  * Null semantics mirror the explode+min form this replaces: null
  * array, empty array, or all-null elements → null (a document with no
  * shingles has no definable signature — callers filter); null
  * ELEMENTS are skipped.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numPerms >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numPerms must be >= 1, got $numPerms")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("mhSig")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $boxed =
         |  graft.functions.MinHashSig.compute($a, $numPerms);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed; }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** The Mersenne prime 2^61 − 1 — the mix's modulus in BOTH engines. */
  val Prime: Long = (1L << 61) - 1

  // coefficient cache, grown on demand (NumPerms is 16 in the engine
  // config; specs occasionally ask for more) — deriving per row would
  // put the MD5s right back in the hot loop
  @volatile private var cachedA: Array[Long] = new Array[Long](0)
  @volatile private var cachedB: Array[Long] = new Array[Long](0)

  private def ensure(n: Int): Unit = if (cachedA.length < n) synchronized {
    if (cachedA.length < n) {
      val a = Array.tabulate(n) { p =>
        Hash60.compute(Array(UTF8String.fromString("minhash_a"),
          UTF8String.fromString(p.toString))) + 1L // in [1, 2^60]: never 0
      }
      val b = Array.tabulate(n) { p =>
        Hash60.compute(Array(UTF8String.fromString("minhash_b"),
          UTF8String.fromString(p.toString))) // in [0, 2^60)
      }
      cachedB = b
      cachedA = a // last: ensure() gates on cachedA.length
    }
  }

  /** Permutation p's multiplier — inlined as a literal into the DuckDB
    * oracle SQL so both engines run the identical mix. */
  def coefA(p: Int): Long = { ensure(p + 1); cachedA(p) }

  /** Permutation p's addend — same contract as [[coefA]]. */
  def coefB(p: Int): Long = { ensure(p + 1); cachedB(p) }

  /** `(a·h + b) mod (2^61 − 1)` in pure 64-bit arithmetic via Mersenne
    * folding (2^61 ≡ 1, so a 128-bit value hi·2^64 + lo reduces as
    * hi·8 + (lo & p) + (lo >>> 61)). Bounds: a ≤ 2^60 and h < 2^60 ⇒
    * the product < 2^120 ⇒ hi < 2^56 ⇒ every partial sum fits a signed
    * long. Spec-pinned against BigInt reference arithmetic. */
  def mix(h: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    var r = (lo & Prime) + (lo >>> 61) + (hi << 3)
    r = (r & Prime) + (r >>> 61)
    if (r >= Prime) r -= Prime
    r += b
    r = (r & Prime) + (r >>> 61)
    if (r >= Prime) r -= Prime
    r
  }

  /** One digest per element, `numPerms` running minima; null when no
    * non-null element exists (no signature is definable). Called from
    * both interpreted eval and generated code. */
  def compute(arr: ArrayData, numPerms: Int): ArrayData = {
    ensure(numPerms)
    val as = cachedA
    val bs = cachedB
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val one = new Array[UTF8String](1)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        one(0) = arr.getUTF8String(i)
        val base = Hash60.compute(one)
        var p = 0
        while (p < numPerms) {
          val v = mix(base, as(p), bs(p))
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Column-API entry. */
  def apply(a: Column, numPerms: Int)(implicit d: DummyImplicit): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(a), numPerms))
  }
}

/** Permutation p's mix of a pre-computed [[Hash60]] base —
  * `(coefA(p)·h + coefB(p)) mod (2^61 − 1)` as a scalar expression, so
  * the relational MinHash shape ([[graft.ops.Dedup.minhashSignatures]])
  * can pay ONE digest per shingle in its own projection column and
  * derive all permutations with these (codegen'd, ~ns) mixes. Null
  * propagates from the child. */
case class MinHashMix(child: Expression, perm: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if perm >= 0 => TypeCheckResult.TypeCheckSuccess
    case LongType =>
      TypeCheckResult.TypeCheckFailure(s"perm must be >= 0, got $perm")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_mix expects bigint, got ${t.simpleString}")
  }

  override protected def nullSafeEval(h: Any): Any =
    MinHashSig.mix(h.asInstanceOf[Long],
      MinHashSig.coefA(perm), MinHashSig.coefB(perm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = MinHashSig.coefA(perm)
    val b = MinHashSig.coefB(perm)
    defineCodeGen(ctx, ev,
      h => s"graft.functions.MinHashSig.mix($h, ${a}L, ${b}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashMix {
  /** Column-API entry. */
  def apply(h: Column, perm: Int)(implicit d: DummyImplicit): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashMix(ColumnBridge.expression(h), perm))
  }
}
