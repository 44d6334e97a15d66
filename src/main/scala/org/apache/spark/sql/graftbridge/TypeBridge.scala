package org.apache.spark.sql.graftbridge

/** `AbstractDataType` (the `inputTypes` element type of
  * `ExpectsInputTypes`) is `private[sql]` in Spark 4 — re-export it for
  * graft's custom expressions, same bridge technique as [[ColumnBridge]].
  */
object TypeBridge {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
