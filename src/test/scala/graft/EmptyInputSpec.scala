package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-corpus robustness: at 100 TB, empty partitions, fully-filtered
  * shards, and day-zero tables are routine — every declared query must
  * degrade to an empty (or neutral) result, never throw. This spec
  * materializes a schema-complete zero-row twin of the fixture tables
  * and drives the ENTIRE registry against it once, accumulating
  * failures so a regression names every broken query, not just the
  * first. (The graph_components NPE on `SUM(comp)`-of-nothing was found
  * exactly this way.) */
class EmptyInputSpec extends AnyFunSuite with SparkSuite {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = new java.io.File("target/empty_fixture").getAbsolutePath
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query tolerates a zero-row corpus (no throws)") {
    val failures = SparkEntry.allDecls.flatMap { d =>
      try { d.fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"${d.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n" +
        failures.mkString("\n"))
  }
}
