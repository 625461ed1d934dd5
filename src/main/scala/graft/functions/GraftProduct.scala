package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact product aggregate: Π x over non-null x, null on empty/all-null input.
  *
  * Backs the reference's compounding primitive `(r + 1).product() - 1`
  * (reference: alphastats/stats.py:49-50). A log/exp rewrite would be
  * wrong for any factor ≤ 0 (returns ≤ −100% are exercised by the
  * reference at tests/test_stats.py:183-192), so this is a true
  * multiplicative aggregate.
  *
  * DeclarativeAggregate = pure-expression buffer updates → participates in
  * whole-stage codegen, supports partial (map-side) aggregation, and is
  * usable as a running-frame window function (Spark evaluates
  * UNBOUNDED PRECEDING..CURRENT ROW frames incrementally, O(n)).
  */
case class GraftProduct(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_product"

  private lazy val product = AttributeReference("product", DoubleType, nullable = false)()
  private lazy val nonEmpty = AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(product, nonEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(1.0), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), product, Multiply(product, Cast(child, DoubleType))),
    Or(nonEmpty, IsNotNull(child))
  )

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Multiply(product.left, product.right),
    Or(nonEmpty.left, nonEmpty.right)
  )

  override lazy val evaluateExpression: Expression =
    If(nonEmpty, product, Literal(null, DoubleType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType] || child.dataType == NullType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_product requires a numeric argument, got ${child.dataType.catalogString}")
    }

  override protected def withNewChildInternal(newChild: Expression): GraftProduct =
    copy(child = newChild)
}

object GraftProduct {
  import graft.core.Bridge

  /** Π c as a Column; usable in agg(...) and over running windows. */
  def product(c: Column): Column =
    Bridge.column(GraftProduct(Bridge.expr(c)).toAggregateExpression())
}
