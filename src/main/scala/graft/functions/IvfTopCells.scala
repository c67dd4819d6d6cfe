package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types._

/** Fused IVF index scan: the ids of the `k` centroids of `cents`
  * (an `array<struct<cid: long, cvec: array<float>>>` column) nearest
  * to `emb` by exact decimal dot product, best first — ordering
  * (dot DESC, cid ASC), each dot the [[DecimalDot]] kernel.
  *
  * This is the assignment/probe hot path of the fitted ANN family
  * (graft.queries.SimilarityFitted): cell assignment is `k = 1`,
  * multi-probe is `k = nProbe`. The declarative formulation —
  * `transform(cs, c -> struct(decimal_dot(emb, c.cvec), c.cid))` into
  * `array_max` / `array_sort` + `slice` — allocates one struct row per
  * centroid per vector and walks the interpreted higher-order-function
  * eval path; at the occupancy-scaled cell count (cells = n/32) that
  * interpretive overhead dominates the whole fitted pipeline
  * (measured: ~760 s for the synthetic 10× third-hop audit, almost all
  * of it in `CreateNamedStruct.eval` under `ArrayTransform`). This
  * kernel is one primitive loop per row — |cents| DecimalDot calls
  * into a k-slot insertion buffer, no per-centroid allocation — with
  * BIT-IDENTICAL output: same exact dots, same (dot DESC, cid ASC)
  * order (`java.lang.Double.compare`; dots are never NaN/−0.0 — the
  * decimal sum widens from BigDecimal, so −0.0 cannot arise).
  *
  * DuckDB twin (graft.queries.SimilarityFitted's `cellSqlOf` /
  * `pcellsSqlOf`): `list_max` / `list_sort` over (s, ±cid)
  * struct_packs of the same per-pair decimal dots.
  *
  * Null contract: null result if either input is null, any centroid
  * entry/field is null, or any dot nulls (element null / length
  * mismatch — the DecimalDot contract). Note this whole-result-null
  * convention is STRICTER than the declarative transform/array_sort
  * form's (which would sort the null-scored struct and still emit
  * cids) — the kernel follows DecimalDot's null discipline, not the
  * HOF twin's. The fitted pipelines filter null embeddings up front,
  * so the difference is unreachable in the declared queries; the
  * contract exists so the kernel degrades predictably instead of
  * throwing.
  */
case class IvfTopCells(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(
    ArrayType(FloatType),
    ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("cvec", ArrayType(FloatType))))))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val c = right.eval(input)
    if (c == null) return null
    IvfTopCells.topk(a.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("ivfTop")
    nullSafeCodeGen(ctx, ev, (e, c) => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
         |  graft.functions.IvfTopCells.topk($e, $c, $k);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfTopCells =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivf_top_cells"
}

object IvfTopCells {

  /** (d1, c1) strictly before (d2, c2) in (dot DESC, cid ASC) order. */
  private def isBefore(d1: Double, c1: Long, d2: Double, c2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c > 0 || (c == 0 && c1 < c2)
  }

  /** Shared by interpreted eval and generated code. Returns the top-k
    * cid array (best first), or null per the expression's contract. */
  def topk(emb: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val kk = math.min(k, n)
    if (kk <= 0) return new GenericArrayData(Array.empty[Long])
    val ds = new Array[Double](kk)
    val ids = new Array[Long](kk)
    var m = 0
    var i = 0
    while (i < n) {
      if (cents.isNullAt(i)) return null
      val st = cents.getStruct(i, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      val cid = st.getLong(0)
      val d = DecimalDot.dot(emb, st.getArray(1))
      if (d == null) return null
      val dv = d.doubleValue()
      var pos = m
      while (pos > 0 && isBefore(dv, cid, ds(pos - 1), ids(pos - 1))) pos -= 1
      if (pos < kk) {
        var j = math.min(m, kk - 1)
        while (j > pos) { ds(j) = ds(j - 1); ids(j) = ids(j - 1); j -= 1 }
        ds(pos) = dv
        ids(pos) = cid
        if (m < kk) m += 1
      }
      i += 1
    }
    new GenericArrayData(ids)
  }

  def apply(emb: Column, cents: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IvfTopCells(
      ColumnBridge.expression(emb), ColumnBridge.expression(cents), k))
  }
}
