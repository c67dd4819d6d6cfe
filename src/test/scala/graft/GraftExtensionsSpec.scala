package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point: a plain-SQL user with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or a
  * post-hoc `GraftExtensions.install`) gets every custom kernel as a
  * SQL function, with values identical to the Column API. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSuite {

  test("extensions-injected session resolves the kernels from plain SQL") {
    // `spark.sql.extensions` is a static conf read at SparkContext
    // construction, which the shared test context predates — so apply
    // the extension object the way getOrCreate would, onto an isolated
    // newSession()'s registry.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val s2 = spark.newSession()
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunctions(ext, s2)
    locally {
      val r = s2.sql(
        """SELECT sha60('hello world') AS h,
          |  wrap_affine(9L, 3L, 7L) AS wa,
          |  simhash60(array(sha60('a'), sha60('b'), sha60('a'))) AS sh,
          |  decimal_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |              array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
          |""".stripMargin).collect()(0)
      assert(r.getAs[Long]("h") == 834523259263570912L) // DuckDB-checked
      assert(r.getAs[Long]("wa") == 3L * 9L + 7L)
      assert(r.getAs[Double]("d") == 4.0)
      val sig = s2.sql(
        """SELECT minhash_sig(array(sha60('x'), sha60('y')),
          |                   array(3L, 5L), array(1L, 2L)) AS sig""".stripMargin)
        .collect()(0).getSeq[Long](0)
      assert(sig.length == 2)
      val bands = s2.sql(
        "SELECT lsh_band_keys(array(1L, 2L, 3L, 4L), 2) AS k")
        .collect()(0).getSeq[Long](0)
      assert(bands.length == 2 && bands.forall(_ >= 0))
      // shingle_bases ≡ the declarative chain it fuses (sha60 of the
      // distinct 3-token shingles; 'a b c d' → 2 shingles)
      val sb = s2.sql("SELECT shingle_bases('a b c d') AS b")
        .collect()(0).getSeq[Long](0)
      val want = Seq("a b c", "b c d").map(t => s2.sql(
        s"SELECT sha60('$t')").collect()(0).getLong(0))
      assert(sb == want, s"got $sb want $want")
    }
    // the functions must NOT leak into the base session's registry
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.newSession().sql("SELECT sha60('x')").collect())

    // input type contracts (ANSI: no implicit coercion into these):
    // a mismatched argument type is an ANALYSIS-time error — never a
    // silent byte-level misread of differently-sized array elements
    assert(s2.sql("SELECT simhash60(array(1L, 2L, 3L)) AS s")
      .collect()(0).getLong(0) >= 0L)
    assertThrows[org.apache.spark.sql.AnalysisException](
      s2.sql("SELECT sha60(123)").collect())
    assertThrows[org.apache.spark.sql.AnalysisException](
      s2.sql("SELECT simhash60(array(1, 2, 3))").collect())
    assertThrows[org.apache.spark.sql.AnalysisException](
      s2.sql("SELECT decimal_dot(array(1.0D), array(2.0D))").collect())
  }

  test("install() registers the same functions on an existing session") {
    GraftExtensions.install(spark)
    val viaSql = spark.sql("SELECT sha60('graft') AS h").collect()(0).getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.XHash.sha60(lit("graft")))
      .collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }
}
