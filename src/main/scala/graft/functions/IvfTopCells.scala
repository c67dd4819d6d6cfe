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

  /** Plain-double dot as a SELECTION BOUND for [[topk]]'s skip guard:
    * fills `out(0)` = recursive double sum of the exact per-term
    * products, `out(1)` = the sum of their absolute values (the error
    * budget); returns false when any element is null (the caller must
    * null the whole result — same contract the exact dot enforces).
    * Each term `fl(x·y)` of two floats is EXACT in double (24+24
    * mantissa bits < 53), so the only estimate error is summation
    * order: |est − Σp| ≤ (n−1)·ε·Σ|p|. */
  private def estimateDot(a: ArrayData, b: ArrayData,
      out: Array[Double]): Boolean = {
    val n = a.numElements()
    var s = 0.0
    var sa = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      s += p
      sa += Math.abs(p)
      i += 1
    }
    out(0) = s
    out(1) = sa
    true
  }

  /** Shared by interpreted eval and generated code. Returns the top-k
    * cid array (best first), or null per the expression's contract.
    *
    * Skip guard (r16): once the k-slot buffer is full, a centroid whose
    * PLAIN double dot sits provably below the current k-th exact dot
    * cannot enter the buffer (nor tie it — ties need exact equality),
    * so the exact decimal dot is computed only for competitive
    * centroids. The bound is rigorous, not heuristic: per-term products
    * are exact in double, the estimate's summation error is
    * ≤ (n−1)·ε·Σ|p|, the exact dot's distance from Σp is the per-term
    * scale-12 quantization (≤ n·5e-13) plus its final decimal→double
    * widening (≤ 1 ulp) — all covered with slack by `eps` below, and
    * the guard only fires when Σ|p| < 1e12, far below the DECIMAL
    * overflow limits, so a skipped centroid can never be one the exact
    * path would have errored on. Output is BIT-IDENTICAL to the
    * guard-free loop (IvfTopCellsSpec pins kernel ≡ declarative sort,
    * including forced bit-equal ties, which the strict inequality
    * never skips). Assignment/probe passes over occupancy-scaled cell
    * counts spend ~all their time here, so skipping the decimal
    * arithmetic for the non-competitive majority is the fitted
    * family's single biggest win. */
  def topk(emb: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val kk = math.min(k, n)
    if (kk <= 0) return new GenericArrayData(Array.empty[Long])
    val ds = new Array[Double](kk)
    val ids = new Array[Long](kk)
    val est = new Array[Double](2)
    val nd = emb.numElements()
    var m = 0
    var i = 0
    while (i < n) {
      if (cents.isNullAt(i)) return null
      val st = cents.getStruct(i, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      val cid = st.getLong(0)
      val cv = st.getArray(1)
      var skip = false
      if (m == kk && nd == cv.numElements()) {
        // estimateDot also performs the null-element walk the exact
        // dot would have done, so the null contract is preserved
        if (!estimateDot(emb, cv, est)) return null
        val e = est(0)
        val sa = est(1)
        if (sa < 1e12 && !java.lang.Double.isNaN(e)) {
          val kth = ds(kk - 1)
          val eps = nd * 5e-13 + nd * 4.6e-16 * sa +
            2 * Math.ulp(Math.max(Math.abs(kth), Math.abs(e)))
          if (e < kth - 2 * eps) skip = true
        }
      }
      if (!skip) {
        val d = DecimalDot.dot(emb, cv)
        if (d == null) return null
        val dv = d.doubleValue()
        var pos = m
        while (pos > 0 && isBefore(dv, cid, ds(pos - 1), ids(pos - 1)))
          pos -= 1
        if (pos < kk) {
          var j = math.min(m, kk - 1)
          while (j > pos) { ds(j) = ds(j - 1); ids(j) = ids(j - 1); j -= 1 }
          ds(pos) = dv
          ids(pos) = cid
          if (m < kk) m += 1
        }
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
