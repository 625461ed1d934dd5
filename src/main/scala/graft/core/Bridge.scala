package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.SqlBridge

/** Column <-> Catalyst Expression bridge for the classic (non-Connect)
  * runtime. Delegates to a shim in the org.apache.spark.sql namespace.
  */
object Bridge {
  def column(e: Expression): Column = SqlBridge.column(e)
  def expr(c: Column): Expression = SqlBridge.expr(c)
}
