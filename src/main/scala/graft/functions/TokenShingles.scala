package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingle construction over a token array — the
  * one-Java-loop replacement for the
  * `transform(sequence(...), i -> concat_ws(" ", element_at...))` HOF
  * chain (r15, guide §1.2 per-task work). Higher-order functions run
  * interpreted (CodegenFallback) and re-bind a lambda variable per
  * element; building the sf0.1 fixture's 3-gram arrays through them
  * cost ~5 s per funnel query. This expression walks the token array
  * once and joins with a single space via `UTF8String.concatWs` — the
  * same separator semantics as `concat_ws` (nulls skipped, empties
  * kept), so the produced gram STRINGS are bit-identical to the HOF
  * form's (TextSpec pins equality for both variants).
  *
  * `distinct = true` additionally dedups keeping FIRST occurrence
  * order — exactly `array_distinct`'s contract. Documents with fewer
  * than n tokens — and a NULL token array, which the HOF form's
  * `when(size(toks) >= n, …)` also routes to the otherwise branch —
  * yield an empty array (never null, matching the old expression's
  * non-nullable when/otherwise). */
case class TokenShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null) return new GenericArrayData(Array.empty[Any])
    val sz = toks.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    def gram(i: Int): UTF8String = {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null
                   else toks.getUTF8String(i + j)
        j += 1
      }
      UTF8String.concatWs(space, parts: _*) // concat_ws law: skip nulls
    }
    if (!distinct) {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = gram(i); i += 1 }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) { seen.add(gram(i)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TokenShingles {
  /** Column form: distinct n-gram shingles ([[graft.ops.Text.shingles]]'
    * engine) or all positional n-grams (`distinct = false`,
    * [[graft.ops.Text.shinglesAll]]'s engine). */
  def col(toks: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(TokenShingles(
      ColumnBridge.expression(toks), n, distinct))
}
