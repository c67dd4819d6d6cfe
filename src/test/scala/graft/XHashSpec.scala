package graft

import graft.functions.XHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused Sha60 kernel must equal the declarative
  * conv(substr(sha2)) formulation — that identity is what ties every
  * hash-family operator to its DuckDB oracle. */
class XHashSpec extends AnyFunSuite with SparkSuite {

  private def samples = {
    import spark.implicits._
    (Seq("", " ", "hello world", "ä ö ü 北京 🎉", "a|b_c",
      "\t tab and \n newline") ++
      Seq.tabulate(200)(i => s"doc $i token${i * 7} ${i * 2654435761L}"))
      .toDF("s")
  }

  test("Sha60 kernel equals conv(substr(sha2(s,256),1,15),16,10)") {
    val rows = samples.select(
      XHash.sha60(col("s")).as("fused"),
      XHash.sha60Declarative(col("s")).as("decl")).collect()
    assert(rows.length > 200)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused=${r.getLong(0)} decl=${r.getLong(1)}"))
    assert(rows.map(_.getLong(0)).forall(_ >= 0L), "sha60 is non-negative")
  }

  test("Sha60 agrees between codegen and interpreted eval") {
    val gen = samples.select(XHash.sha60(col("s"))).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp =
        samples.select(XHash.sha60(col("s"))).collect().map(_.getLong(0))
      assert(interp.toSeq == gen.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }
}
