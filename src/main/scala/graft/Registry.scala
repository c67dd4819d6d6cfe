package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared operator query: the Spark plan builder plus (optionally)
  * the ANSI-SQL oracle DuckDB replays on the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class Decl(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Decl {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Decl =
    Decl(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Decl =
    Decl(name, fn, None)
}

/** Cross-engine determinism helpers (SURVEY.md §2 determinism rules).
  *
  * The binding hazard for the DuckDB hash-compare gate is floating-point
  * summation order: Spark and DuckDB reduce partitions in different orders,
  * so `SUM(double)` differs in the last bits. Rounding the *result* only
  * shrinks, never removes, the boundary risk. Instead we make the sum
  * itself order-independent: cast each row to a fixed-scale DECIMAL, sum
  * exactly (decimal addition is associative), and cast the exact result
  * back to double. Both engines then produce bit-identical doubles.
  *
  * The cast scale must exceed the data's true decimal precision: the
  * test tables carry money values with 2 decimals, so derived products
  * (price × (1−discount)) have exactly 4 — casting those at scale ≤4
  * lands exactly on rounding ties, where Spark (HALF_UP over the
  * double's shortest decimal repr) and DuckDB (rounding the binary
  * value) disagree systematically. At scale 6 no data value sits on a
  * boundary and the double's ~1-ulp error (2e-12 at 1e4 magnitude) is
  * far inside the 5e-7 tie window, so both engines round identically.
  */
object Det {
  /** Order-independent, cross-engine-exact double sum; SQL twin [[sqlSum]]. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)
  /** Order-independent average = exact decimal sum / count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  // the VARCHAR hop makes DuckDB's decimal→double conversion correctly
  // rounded (exact digits + strtod) == Spark's BigDecimal.doubleValue;
  // the direct cast double-rounds via the scaled integer once the sum
  // exceeds 2^53/10^scale (≈9e9 at scale 6 — ungrouped money sums hit
  // this) — see the round-3 note below on dsumProd2
  def sqlSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(x: String): String = s"(${sqlSum(x)} / COUNT(*))"

  /** Spark-parser twins for queries whose SPARK body goes through
    * spark.sql: no VARCHAR hop — Spark rejects bare VARCHAR, and its
    * decimal→double cast is already correctly rounded, so the hop is a
    * DuckDB-side repair only. */
  def sparkSqlSum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE)"
  def sparkSqlAvg(x: String): String = s"(${sparkSqlSum(x)} / COUNT(*))"

  /** Exact sum of a product of two money-precision (≤2-decimal) doubles.
    * Each FACTOR is cast to DECIMAL(18,2) — exact, the value is ≥0.005
    * from any rounding tie — then multiplied exactly in DECIMAL(37,4)
    * and summed exactly. Casting the double *product* instead breaks at
    * large magnitude: ~1e10 values have a double ulp (~2e-6) wider than
    * the scale-6 grid, so Spark's shortest-repr HALF_UP and DuckDB's
    * binary rounding land on different cells (hit by agg_corr's Σy²).
    * SQL twin [[sqlSumProd2]]. */
  def dsumProd2(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2)))
      .cast(DoubleType)
  /** The VARCHAR hop in the twin matters: a product sum's scaled
    * integer exceeds 2^53 (Σ price² ≈ 7e12 at scale 4 → 7e16), where
    * DuckDB's direct decimal→double conversion double-rounds while
    * Spark's BigDecimal.doubleValue is correctly rounded. decimal→
    * VARCHAR prints exact digits and VARCHAR→DOUBLE (strtod) is
    * correctly rounded, making DuckDB match Spark bit-for-bit. */
  def sqlSumProd2(a: String, b: String): String =
    s"CAST(CAST(SUM(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2)))" +
      " AS VARCHAR) AS DOUBLE)"

  /** Timestamps never leave a query raw (nanos/µs + naive-vs-UTC hazards):
    * emit epoch-µs longs. DuckDB twin: `epoch_us(ts)`. */
  def epochUs(c: Column): Column = unix_micros(c)
  /** Date-as-string output; DuckDB twin: `strftime(d, '%Y-%m-%d')`. */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
