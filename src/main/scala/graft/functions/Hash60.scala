package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit keyed hash
  * (see [[graft.ops.Portable]]).
  *
  * Bit-for-bit equivalent to
  * `CAST(conv(substring(md5(concat_ws(chr(1), args...)), 1, 15), 16, 10)
  * AS BIGINT)` — the first 15 hex digits (60 bits) of the md5 of the
  * chr(1)-joined arguments — but computed straight from the digest bytes:
  * no hex-string materialization, no base-16 string parse, and a reused
  * per-thread MessageDigest. Measured ~3-5x over the composed built-in
  * chain on hash-dense operators (MinHash signatures, winnowing,
  * SimHash), and it keeps the operator inside whole-stage codegen via
  * [[doGenCode]].
  *
  * Null semantics mirror `concat_ws`: null arguments are skipped (no
  * separator emitted for them); the result is never null.
  */
case class Hash60(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 expects string arguments, got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val parts = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      parts(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    Hash60.compute(parts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("h60args")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |$arr[$i] = ${e.isNull} ? null : ${e.value};""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |UTF8String[] $arr = new UTF8String[${children.length}];
        |$assigns
        |long ${ev.value} = graft.functions.Hash60.compute($arr);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object Hash60 {

  private val Sep: Byte = 1

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit value = integer of the first 15 hex digits of the md5 — i.e.
    * digest bytes 0..6 plus the high nibble of byte 7. Called from both
    * interpreted eval and generated code. */
  def compute(parts: Array[UTF8String]): Long = {
    val d = md.get()
    d.reset()
    var first = true
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p != null) {
        if (!first) d.update(Sep)
        d.update(p.getBytes)
        first = false
      }
      i += 1
    }
    val g = d.digest()
    ((g(0) & 0xffL) << 52) | ((g(1) & 0xffL) << 44) | ((g(2) & 0xffL) << 36) |
      ((g(3) & 0xffL) << 28) | ((g(4) & 0xffL) << 20) | ((g(5) & 0xffL) << 12) |
      ((g(6) & 0xffL) << 4) | ((g(7) & 0xffL) >>> 4)
  }

  /** Column-API entry: casts arguments to string like the composed form. */
  def apply(cols: Column*)(implicit d: DummyImplicit): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      Hash60(cols.map(c => ColumnBridge.expression(c.cast("string"))).toSeq))
  }

  /** SQL function name for use inside `expr(...)` strings (higher-order
    * function lambdas can't reach the Column API). */
  val FuncName = "graft_hash60"

  /** Idempotently register [[FuncName]] in the session's function
    * registry so `expr(s"$FuncName(a, b)")` resolves. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(FuncName,
      (exprs: Seq[Expression]) =>
        Hash60(exprs.map(e =>
          if (e.dataType == StringType) e else Cast(e, StringType))),
      "built-in")
  }
}
