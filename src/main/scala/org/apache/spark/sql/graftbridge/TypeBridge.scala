package org.apache.spark.sql.graftbridge

/** `AbstractDataType` (the type of `ExpectsInputTypes.inputTypes`) is
  * `private[sql]`, so expressions living in the `graft` namespace
  * cannot name it directly; this public alias, defined inside the sql
  * package namespace like [[ColumnBridge]], lets them declare input
  * type contracts and get Catalyst's implicit coercion + analysis-time
  * type errors. */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
