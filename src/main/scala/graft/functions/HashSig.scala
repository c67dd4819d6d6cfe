package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature kernels for the hash-family dedup operators.
  *
  * The declarative formulations (`transform` × 64 + `array_min`, or 60 ×
  * `filter` + `size`) are semantically right but materialize one
  * intermediate array per hash variant per row. These expressions fuse
  * the whole signature into one primitive-typed loop inside whole-stage
  * codegen — same values, ~0 allocation. Values stay bit-identical to
  * the DuckDB oracle twins (wrap-around multiply-add over non-negative
  * sha60 bases; see graft.functions.XHash).
  */

/** All 64 MinHash values in one pass: `min over bases of a_i·h + b_i`
  * (Z/2^64 wrap) for each i. Null elements are SKIPPED — exactly the
  * declarative twin's semantics, where `transform` maps null→null and
  * `array_min` ignores nulls (Long.MaxValue sentinels remain if the
  * input is empty or all-null). */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(a.length == b.length)

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(a.length)(Long.MaxValue)
    var k = 0
    while (k < arr.numElements()) {
      if (!arr.isNullAt(k)) {
        val h = arr.getLong(k)
        var i = 0
        while (i < a.length) {
          val v = a(i) * h + b(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[${a.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $k = 0; $k < $c.numElements(); $k++) {
         |  if ($c.isNullAt($k)) continue;
         |  long $h = $c.getLong($k);
         |  for (int $i = 0; $i < ${a.length}; $i++) {
         |    long $v = $aRef[$i] * $h + $bRef[$i];
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 60-bit SimHash in one pass: bit j of the result is set iff more than
  * half of the input hashes have bit j set (ties → unset, matching the
  * `2·cnt > n` formulation of the declarative twin). */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](60)
    var k = 0
    while (k < arr.numElements()) {
      val h = arr.getLong(k)
      var j = 0
      while (j < 60) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      k += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (2 * cnt(j) > arr.numElements()) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[60];
         |for (int $k = 0; $k < $c.numElements(); $k++) {
         |  long $h = $c.getLong($k);
         |  for (int $j = 0; $j < 60; $j++) $cnt[$j] += (int) (($h >>> $j) & 1L);
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if (2 * $cnt[$j] > $c.numElements()) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

/** All LSH band keys in one pass: key b = sha60 of the string
  * `"b_h(4b)_h(4b+1)_h(4b+2)_h(4b+3)"` over the signature array —
  * byte-for-byte the value of `sha60(concat_ws('_', b, h...))` and of
  * the DuckDB twin in Dedup.sqlSignatureCtes, but with one reused
  * digest instead of 16 sha expression trees in the generated code. */
case class LshBandKeys(child: Expression, bandRows: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      LshBandKeys.keys(input.asInstanceOf[ArrayData], bandRows))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshBandKeys.keys($c, $bandRows));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)

  override def prettyName: String = "lsh_band_keys"
}

object LshBandKeys {
  /** Shared by interpreted eval and generated code; the digest fold is
    * Sha60's — one definition, so band keys can never drift from the
    * sha60 the oracle replays. Null elements are skipped in the joined
    * rendering (concat_ws semantics, = the declarative twin); a length
    * not divisible by bandRows is a loud error, because silently
    * dropping tail hashes would degrade LSH recall invisibly. */
  def keys(sig: ArrayData, bandRows: Int): Array[Long] = {
    require(sig.numElements() % bandRows == 0,
      s"signature length ${sig.numElements()} is not a multiple of " +
        s"bandRows=$bandRows")
    val nBands = sig.numElements() / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder
      sb.append(b)
      var r = 0
      while (r < bandRows) {
        val idx = b * bandRows + r
        if (!sig.isNullAt(idx)) sb.append('_').append(sig.getLong(idx))
        r += 1
      }
      out(b) = Sha60.hashBytes(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      b += 1
    }
    out
  }
}

/** text → sha60 bases of its DISTINCT 3-token shingles, one node.
  * Fuses the declarative chain
  * `transform(array_distinct(transform(sequence(...), i -> concat_ws(
  * ' ', element_at(tks,i), ...))), s -> sha60(s))` over
  * `tks = split(text, ' ')` into a single expression. The values are
  * identical (HashSigSpec pins kernel ≡ declarative over the corpus
  * plus adversarial strings — including multi-space runs, where
  * split's regex keeps empty tokens, and the short-doc least()
  * clamp); what the fusion buys is ANALYSIS cost, not just runtime:
  * the nested higher-order-function tree was re-walked by every
  * analyzer/optimizer pass of every dedup plan, the dominant driver
  * cost of the family's first touch (r7 verdict item 6). Duplicate
  * shingles are dropped exactly like array_distinct; downstream
  * consumers (MinHashSig min-fold) are duplicate-insensitive anyway. */
case class ShingleBases(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleBases.evalText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleBases.evalText($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleBases =
    copy(child = newChild)

  override def prettyName: String = "shingle_bases"
}

object ShingleBases {
  /** Shared by interpreted eval and generated code. Split semantics =
    * Spark's `split(text, " ")` = Java `split(" ", -1)`: empty tokens
    * from consecutive spaces are kept. 1-indexed i ∈ [1, max(n−2, 1)]
    * with least()-clamped lookahead, exactly the declarative twin.
    *
    * Named `evalText`, NOT `eval`: the case class inherits
    * `Expression.eval(InternalRow)`, and a companion method with the
    * same name suppresses scalac's static forwarder — janino then sees
    * only the inherited signature and the generated
    * `ShingleBases.evalText(UTF8String)` call would fail to compile,
    * silently degrading every dedup-signature projection to the
    * interpreter (the r10 verdict's one defect). CodegenOnlySpec pins
    * compilation under CODEGEN_ONLY so the clash can't reappear. */
  def evalText(text: UTF8String): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var i = 0
    while (i < m) {
      seen.add(toks(i) + " " + toks(math.min(i + 1, n - 1)) + " " +
        toks(math.min(i + 2, n - 1)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = Sha60.hashBytes(
        it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      k += 1
    }
    new GenericArrayData(out)
  }
}

object HashSig {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minhashSig(bases: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(bases), a, b))

  def shingleBases(text: Column): Column =
    ColumnBridge.column(ShingleBases(ColumnBridge.expression(text)))

  def simhash60(hashes: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(hashes)))

  def lshBandKeys(sig: Column, bandRows: Int): Column =
    ColumnBridge.column(LshBandKeys(ColumnBridge.expression(sig), bandRows))
}
