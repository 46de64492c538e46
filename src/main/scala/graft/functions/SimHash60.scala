package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash from a pre-hashed token array (`array<bigint>`
  * of [[Hash60]] values): bit b of the fingerprint is set when the sum
  * over tokens of ±1 (by bit b of the token's hash) is ≥ 0.
  *
  * Value-identical to the declarative higher-order-function form
  * [[graft.ops.Text.simhash]] (TextSpec pins the equality, including
  * the all-bits-set empty-array case), but evaluated as one tight
  * codegen'd loop — one pass over the hash array maintaining 60 bit
  * counters — instead of the interpreted 60-lambda aggregate (O(60·n)
  * interpreted ops per row). This is the per-row fingerprint the
  * STATELESS streaming near-dedup gate
  * ([[graft.streaming.StreamOps.dedupNearStreamAgainst]]) computes for
  * every arriving document — the batch relational form
  * ([[graft.ops.Dedup.simhashes]]) stays a groupBy, which an
  * append-mode stream cannot run.
  *
  * Null if the array is null or any element is null (mirroring the HOF
  * form's null propagation).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash60.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("simBoxed")
      s"""java.lang.Long $boxed = graft.functions.SimHash60.compute($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  val Bits = 60

  /** One pass over the hash array; boxed return so generated code can
    * distinguish null (any null element → null, like the HOF form). */
  def compute(hs: ArrayData): java.lang.Long = {
    val counts = new Array[Int](Bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) >= 0) out |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Column-API entry. */
  def apply(a: Column)(implicit d: DummyImplicit): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash60(ColumnBridge.expression(a)))
  }
}
