package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DecimalDot, LshBandKeys, MinHashSig, Sha60, ShingleBases, SimHash60, WrapAffine}

/** Session-extension entry point: installs the engine's custom Catalyst
  * expressions as SQL functions, so a plain-SQL user gets them without
  * touching the Scala Column API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT sha60(text), simhash60(transform(split(text, ' '), t -> sha60(t)))
  *   FROM documents
  * }}}
  *
  * Wiring is `injectFunction` only — the engine deliberately ships no
  * custom optimizer `Rule` or `SparkStrategy` (SURVEY.md §4.4: every
  * operator composes from Catalyst-planned primitives; the custom
  * surface is scalar/array kernels, which is exactly what function
  * injection is for).
  *
  * Constant arguments (the affine family, band width) must be foldable
  * literals — the kernels specialize on them at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(
          classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {

  private def longConst(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  private def longArray(e: Expression, what: String): Array[Long] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
      children.map(longConst(_, what)).toArray
    case other => throw new IllegalArgumentException(
      s"$what must be array(<literal longs>), got $other")
  }

  /** (name, usage, builder) for every injected function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("sha60",
      "_FUNC_(str) - deterministic non-negative 60-bit hash (SHA-256 prefix)",
      exprs => Sha60(exprs.head)),
    ("wrap_affine",
      "_FUNC_(h, a, b) - a*h + b over Z/2^64 (ANSI-safe wrap-around)",
      exprs => WrapAffine(exprs(0),
        longConst(exprs(1), "a"), longConst(exprs(2), "b"))),
    ("minhash_sig",
      "_FUNC_(bases, array(a...), array(b...)) - per-row MinHash signature",
      exprs => MinHashSig(exprs(0),
        longArray(exprs(1), "a"), longArray(exprs(2), "b"))),
    ("simhash60",
      "_FUNC_(hashes) - 60-bit SimHash of an array of 60-bit hashes",
      exprs => SimHash60(exprs.head)),
    ("lsh_band_keys",
      "_FUNC_(sig, band_rows) - sha60 band keys over a signature array",
      exprs => LshBandKeys(exprs(0), longConst(exprs(1), "band_rows").toInt)),
    ("decimal_dot",
      "_FUNC_(a, b) - exact order-independent dot product of float arrays",
      exprs => DecimalDot(exprs(0), exprs(1))),
    ("shingle_bases",
      "_FUNC_(text) - sha60 bases of the distinct 3-token shingles",
      exprs => ShingleBases(exprs.head)))

  /** Same registrations applied to an already-built session (for
    * sessions constructed without the extensions conf). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
