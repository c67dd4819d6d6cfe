package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog layer (SURVEY.md §2 tier A) — the Spark-native analogue of the
  * reference's metastore client: where `dask_hivemetastore` issues Thrift
  * `get_table` / `get_partitions[_by_filter]` calls and dispatches on the
  * SerDe, we register tables in the session catalog and let the analyzer
  * + `PruneFileSourcePartitions` do lookup and pruning.
  *
  * Two catalog backends:
  *  - session temp views over the driver's parquet dirs (used by the
  *    tier-A queries — works inside the harness's plain session);
  *  - a real embedded-Derby Hive metastore (`enableHiveSupport`), with
  *    external tables + `SHOW PARTITIONS` + metastore-side pruning,
  *    exercised in CatalogSpec where we own the session builder.
  */
object Catalog {

  /** Register every test table as a session temp view (idempotent). */
  def registerAll(s: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(s, dir) else Tables.t(s, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Scratch dir for materialized formats (csv/json/partitioned parquet),
    * keyed by scale-factor name so sfs don't clobber each other. */
  def scratch(dir: String, kind: String): String = {
    val sf = dir.replaceAll(".*/", "")
    s"/root/repo/target/graft_io/$sf/$kind"
  }
}
