package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftProduct

/** Spark session extension: registers graft's custom Catalyst functions for
  * SQL use. Attach at session build time with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[Graft.register]] on an existing session.
  *
  * Functions:
  *  - `graft_product(x)`: exact multiplicative aggregate (Π x over non-null
  *    x, null on empty) — the compounding primitive; usable as a plain
  *    aggregate and as a running window function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.productDescriptor)
  }
}

object GraftExtensions {
  private[graft] val productDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_product"),
    new ExpressionInfo(classOf[GraftProduct].getName, "graft_product"),
    (children: Seq[Expression]) => GraftProduct(children.head))
}

/** Imperative registration for sessions built without the extension. */
object Graft {
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = GraftExtensions.productDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
