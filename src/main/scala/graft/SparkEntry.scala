package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 registers a [[Decl]] in
  * one of the `graft.queries` modules; this object is just the aggregation
  * point the driver harness (Verify/Bench) reads.
  */
object SparkEntry {

  def allDecls: Seq[Decl] =
    _root_.graft.queries.Relational.decls ++
      _root_.graft.queries.Warehouse.decls ++
      _root_.graft.queries.TpcH.decls ++
      _root_.graft.queries.Stats.decls ++
      _root_.graft.queries.MlPrep.decls ++
      _root_.graft.queries.Windows.decls ++
      _root_.graft.queries.TimeWindows.decls ++
      _root_.graft.queries.Scalars.decls ++
      _root_.graft.queries.AsofRange.decls ++
      _root_.graft.queries.Udx.decls ++
      _root_.graft.queries.Similarity.decls ++
      _root_.graft.queries.SimilarityFitted.decls ++
      _root_.graft.queries.Text.decls ++
      _root_.graft.queries.Dedup.decls ++
      _root_.graft.queries.Curation.decls ++
      _root_.graft.queries.Sketches.decls ++
      _root_.graft.queries.CatalogIO.decls ++
      _root_.graft.queries.Dq.decls ++
      _root_.graft.multimodal.Multimodal.decls ++
      _root_.graft.queries.StreamingBatch.decls

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    allDecls.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    allDecls.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
