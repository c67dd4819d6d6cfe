package graft

import org.apache.spark.sql.SparkSession

/** Shared session for test suites — one lazy session per JVM (suites run
  * sequentially; CatalogSpec manages its own Hive-enabled session and
  * restores a clean slate afterwards). */
trait SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
