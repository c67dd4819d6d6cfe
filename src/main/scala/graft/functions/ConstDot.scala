package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Plain-double dot of a float-array column with a CONSTANT weight
  * vector, evaluated as the left-associative IEEE chain
  * `((x₁·w₁ + x₂·w₂) + x₃·w₃) + …` — the kernel form of the unrolled
  * `element_at(e,1)*w₁ + element_at(e,2)*w₂ + …` expression tree.
  *
  * Why a kernel and not the unrolled tree: a 64-term tree is ~500
  * Catalyst nodes PER CENTROID — at 8 centroids the analyzer/optimizer/
  * janino pipeline spends seconds per query on plan bookkeeping before
  * a single row moves (measured: 2.8 s planning for 2 000 rows). This
  * node is O(1) plan size and a tight primitive loop at runtime.
  *
  * Determinism contract (mirrors the DuckDB textual chain twin,
  * [[graft.queries.Similarity]]'s `sqlDotConst`):
  *  - identical doubles in, fixed evaluation order, correctly-rounded
  *    IEEE `*`/`+` ⇒ bit-identical result in any engine;
  *  - the accumulator STARTS AT THE FIRST TERM (not 0.0 + t₁ — that
  *    would turn a −0.0 first term into +0.0);
  *  - a null element nulls the result (NULL propagates through the
  *    SQL chain the same way);
  *  - a length mismatch nulls the result (DuckDB's out-of-range `[k]`
  *    is NULL, which nulls the chain).
  */
case class ConstDot(child: Expression, weights: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null
    else ConstDot.dot(a.asInstanceOf[ArrayData], weights)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("constDotW", weights, "double[]")
    val boxed = ctx.freshName("cdot")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Double $boxed = graft.functions.ConstDot.dot($c, $wRef);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ConstDot = copy(child = newChild)

  override def prettyName: String = "const_dot"

  // weights identity: two ConstDots are equal iff their weight VALUES
  // match (Array equality is reference equality — fix it for plan
  // canonicalization / subexpression elimination)
  override def equals(other: Any): Boolean = other match {
    case ConstDot(c, w) =>
      c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
}

object ConstDot {
  /** Shared by interpreted eval and generated code. */
  def dot(a: ArrayData, w: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (n != w.length || n == 0) return null
    if (a.isNullAt(0)) return null
    var s = a.getFloat(0).toDouble * w(0)
    var i = 1
    while (i < n) {
      if (a.isNullAt(i)) return null
      s = s + a.getFloat(i).toDouble * w(i)
      i += 1
    }
    s
  }

  def apply(col: Column, weights: Seq[Float]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      ConstDot(ColumnBridge.expression(col), weights.map(_.toDouble).toArray))
  }
}
