package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types.{DataType, LongType}

/** `a·h + b` over Z/2^64 (two's-complement wrap-around) as a native
  * codegen'd Catalyst expression.
  *
  * Why custom: Spark 4 runs with ANSI mode on, where the built-in `*`/`+`
  * on longs throw ARITHMETIC_OVERFLOW — but a universal hash family
  * *wants* modular wrap-around. Java's `long` arithmetic wraps natively,
  * so the generated code is a single fused multiply-add; this is the
  * textbook case for dropping to a custom `Expression` (built-ins cannot
  * express the semantics), per the preference order in the build brief.
  *
  * Used by the MinHash signature stage (graft.queries.Dedup): one strong
  * xxhash64 base per shingle, then 64 affine variants via this
  * expression — ~4× faster than 64 seeded xxhash64 re-hashes at sf0.1.
  */
case class WrapAffine(child: Expression, a: Long, b: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(h: Any): Any =
    a * h.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(${a}L * $c + ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): WrapAffine =
    copy(child = newChild)

  override def prettyName: String = "wrap_affine"
}

object WrapArith {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column wrapper for [[WrapAffine]]. */
  def wrapAffine(h: Column, a: Long, b: Long): Column =
    ColumnBridge.column(WrapAffine(ColumnBridge.expression(h), a, b))
}
