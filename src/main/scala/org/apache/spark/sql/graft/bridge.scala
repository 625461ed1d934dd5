/* Lives in the org.apache.spark.sql namespace solely to reach the
 * classic runtime's private[sql] Column <-> Expression converters. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully CONVERT a DSL-built Column into a catalyst Expression tree.
    * `expr` returns a lazy ColumnNodeExpression wrapper, which analyzes
    * fine at Dataset boundaries but survives unresolved when returned from
    * a function-registry builder (→ "Cannot generate code for
    * columnnodeexpression"); this runs the classic converter so registry
    * functions can be authored with the public functions DSL. */
  def convertedExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Codegen'd Bloom probe over a serialized
    * `org.apache.spark.util.sketch.BloomFilter` image: the builtin
    * `BloomFilterMightContain` expression (what Spark's own runtime-filter
    * injection plants), which requires a FOLDABLE sketch argument — hence
    * bytes-as-literal, not a joined column. Not reachable from user SQL
    * (`might_contain` isn't in the public function registry on this build),
    * so the Column has to be constructed here in the bridge.
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(Literal(bloomBytes, BinaryType), expr(value)))
}
