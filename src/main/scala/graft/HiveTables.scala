package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User-facing facade — the engine's analogue of the reference's single
  * public entry point `table_to_dask(database, table, filters)`:
  *
  *  1. resolve the table through the session catalog (a real Hive
  *     metastore when the session has `enableHiveSupport`, the in-memory
  *     catalog otherwise) — the analyzer's metastore lookup replaces the
  *     reference's Thrift `get_table` round-trip;
  *  2. apply partition-key filters — Catalyst's
  *     PruneFileSourcePartitions / PruneHiveTablePartitions pushes them
  *     into partition enumeration, replacing `get_partitions_by_filter`
  *     (metastore-side pruning, the reference's one optimization);
  *  3. return a lazy DataFrame — SerDe dispatch (parquet/ORC/CSV/JSON
  *     readers) already happened at table-registration time, so unlike
  *     the reference there is no per-call reader branching.
  *
  * A reference user's
  * `table_to_dask("sales", "orders", [("year", "=", 1996)])` becomes
  * `HiveTables.table(spark, "sales", "orders", Seq(col("year") === 1996))`.
  */
object HiveTables {

  // backtick-quote identifiers: the reference passes raw strings to the
  // metastore client, so a dotted or spaced name must not be re-parsed
  // as a multi-part reference here (dask_hivemetastore core.py)
  private def q(id: String) = "`" + id.replace("`", "``") + "`"

  /** Load a catalog table as a lazy DataFrame, with optional filters
    * (partition-key predicates prune at the metastore/file-index level;
    * other predicates push down to the scan). */
  def table(spark: SparkSession, database: String, name: String,
      filters: Seq[Column] = Nil): DataFrame =
    filters.foldLeft(spark.table(s"${q(database)}.${q(name)}"))(
      (df, f) => df.filter(f))

  /** Register an external table over existing files from a FieldSchema-
    * shaped (column name, Hive type string) list — the write direction
    * of the reference's metastore model (its StorageDescriptor carries
    * exactly these strings; graft.HiveTypes is the §1.2 type map). */
  def createExternal(spark: SparkSession, database: String, name: String,
      cols: Seq[(String, String)], location: String,
      format: String = "parquet"): DataFrame =
    spark.catalog.createTable(s"${q(database)}.${q(name)}", source = format,
      schema = HiveTypes.schemaOf(cols), options = Map("path" -> location))

  /** List a database's tables (the reference's `get_all_tables`). */
  def tables(spark: SparkSession, database: String): Seq[String] =
    spark.catalog.listTables(database).collect().map(_.name).toSeq

  /** List databases (the reference's `get_all_databases`). */
  def databases(spark: SparkSession): Seq[String] =
    spark.catalog.listDatabases().collect().map(_.name).toSeq

  /** List a partitioned table's partition specs (the reference's
    * `get_partitions`): rows like `o_year=1996`, straight from the
    * catalog's partition enumeration (metastore-backed under Hive). */
  def partitions(spark: SparkSession, database: String,
      name: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS ${q(database)}.${q(name)}")
      .collect().map(_.getString(0)).toSeq
}
