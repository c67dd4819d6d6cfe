package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.types.StructType

/** Driver-direct parquet schema probe for the SINGLE-footer common case.
  *
  * `spark.read.parquet(path).schema` schedules a distributed
  * footer-merging job even when the "table" is one plain parquet file —
  * measured at 0.2–0.4 s of scheduler round-trip per first touch, ×10
  * fixture tables per fresh process (graft r17 profile). Spark's own
  * inference for a non-merging read is exactly: read one footer, convert
  * it with [[ParquetToSparkSchemaConverter]] under the session's SQLConf
  * flags (binaryAsString, int96AsTimestamp, inferTimestampNTZ,
  * nanosAsLong). This bridge performs those two steps on the driver —
  * same converter, same conf — and returns None for every layout where
  * single-footer inference would NOT be equivalent (multiple data files
  * whose footers Spark would merge, partition-directory layouts whose
  * keys inference would inject, summary files, empty dirs), so callers
  * fall back to the job-based path there. TablesInvalidateSpec pins
  * bridge-vs-inference equality on every fixture table at every SF.
  *
  * File-source nullability: Spark forces every data column nullable on
  * read (`HadoopFsRelation.schema` calls `asNullable`), so the converted
  * footer schema is normalized the same way before returning. */
object SchemaBridge {

  private def isDataFile(n: String): Boolean =
    n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")

  /** The table's single parquet data file, or None when the layout needs
    * Spark's general inference (0 or 2+ data files, nested dirs). */
  private def singleDataFile(f: java.io.File): Option[java.io.File] =
    if (f.isFile) Some(f).filter(x => isDataFile(x.getName))
    else {
      val children = Option(f.listFiles()).getOrElse(Array.empty)
      if (children.exists(_.isDirectory)) None // partitioned layout
      else children.filter(c => isDataFile(c.getName)) match {
        case Array(one) => Some(one)
        case _ => None
      }
    }

  def inferSingleFooter(s: SparkSession, path: String): Option[StructType] =
    try singleDataFile(new java.io.File(path)).map { file =>
      val hconf = s.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), hconf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val msg =
        try reader.getFooter.getFileMetaData.getSchema
        finally reader.close()
      new ParquetToSparkSchemaConverter(s.sessionState.conf)
        .convert(msg).asNullable
    } catch { case scala.util.control.NonFatal(_) => None }
}
