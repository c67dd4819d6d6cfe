package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine 64-bit-ish hashing: the building block that lets the
  * hash-family operators (MinHash LSH, SimHash, winnowing fingerprints,
  * hash-gate sampling) be DuckDB-oracled instead of rows-only checked.
  *
  * Spark's `xxhash64`/`hash` have no DuckDB twin, so any operator built
  * on them can only be property-tested. Instead we derive a 60-bit
  * integer from sha-256 — both engines agree on sha-256 of UTF-8 text
  * and on hex→int conversion, so `sha60` is bit-identical across
  * engines, partitionings, and runs:
  *
  *   Spark:  conv(substr(sha2(s, 256), 1, 15), 16, 10) :: long
  *   DuckDB: CAST(('0x' || substr(sha256(s), 1, 15)) AS BIGINT)
  *
  * 15 hex chars = 60 bits keeps every value strictly positive in a
  * signed 64-bit long, which in turn keeps modular arithmetic on top of
  * it (the [[WrapAffine]] MinHash family) expressible in DuckDB as plain
  * HUGEINT math (see [[sqlWrapAffine]]).
  *
  * Cost note (100 TB): sha-256 is ~5× slower per byte than xxhash64 but
  * both are per-row map-side work that never hits the wire; the shuffle
  * and join shapes — the actual scale constraints — are unchanged. A
  * deployment that does not need cross-engine reproducibility can swap
  * `xxhash64` back in without touching any operator shape.
  */
/** [[XHash.sha60]] as one fused expression: SHA-256 digest → top 60
  * bits, skipping the hex-encode + 15-char-substring + base-16-parse
  * round trip of the declarative `conv(substr(sha2(s,256),1,15),16,10)`
  * (same value — the first 15 hex chars ARE the top 60 bits; XHashSpec
  * pins the equivalence). */
case class Sha60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Sha60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha60 =
    copy(child = newChild)

  override def prettyName: String = "sha60"
}

object Sha60 {
  // one digest per thread — getInstance per hashed value is the
  // dominant allocation in the signature hot loops
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("SHA-256"))

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  /** SHA-256 of `bytes`, folded to the top 60 bits (= the first 15 hex
    * chars). The single definition of the digest→long fold — shared
    * with LshBandKeys so the band keys can never drift from sha60. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

object XHash {

  /** Deterministic 60-bit non-negative hash of a string column (fused
    * [[Sha60]] kernel; declarative twin kept as [[sha60Declarative]]). */
  def sha60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Sha60(ColumnBridge.expression(c.cast(StringType))))
  }

  /** The formulation [[sha60]] fuses — and the shape of the DuckDB twin. */
  private[graft] def sha60Declarative(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast(LongType)

  /** DuckDB twin of [[sha60]] — `x` must be a VARCHAR expression. */
  def sqlSha60(x: String): String =
    s"CAST(('0x' || substr(sha256($x), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[WrapAffine]] `a·h + b mod 2^64` for NON-NEGATIVE
    * `h` (e.g. a [[sha60]] value) and non-negative constants: HUGEINT
    * multiply-add, wrap at 2^64, then map back into signed-long range
    * exactly like Java's two's-complement arithmetic does. */
  def sqlWrapAffine(h: String, a: Long, b: Long): String = {
    require(a >= 0 && b >= 0, "use non-negative constants for the SQL twin")
    val u = s"((CAST($a AS HUGEINT) * ($h) + $b) % 18446744073709551616)"
    s"CAST(CASE WHEN $u >= 9223372036854775808 " +
      s"THEN $u - 18446744073709551616 ELSE $u END AS BIGINT)"
  }
}
