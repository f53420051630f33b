package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._

/** Expression → Column bridge. Spark 4 made the `Column` companion
  * `private[sql]` (columns wrap ColumnNodes, not Expressions), so a library
  * exposing a NATIVE Catalyst expression as a `Column` needs one shim
  * compiled inside the `org.apache.spark.sql` package tree — the standard
  * pattern for Spark-native extension libraries. This is the only file in
  * the repo outside the `graft` namespace.
  */
object ExpressionBridge {
  def column(e: Expression): Column = Column(e)
}
