package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.Bridge

/** Codegen'd vector primitives over `array<float>` / `array<double>`
  * embedding columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — lambda invocation per multiply. These are
  * tight generated Java loops over the underlying ArrayData (participating
  * in whole-stage codegen), which is what a 100-TB similarity scan wants.
  * Element nulls are not expected in embedding vectors (elements are read
  * primitively); length mismatch uses the shorter length, like `zip_with`
  * would after dropping the tail.
  */
trait VectorElementSupport { self: Expression =>
  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float|double>, got ${other.catalogString}")
    }

  protected def readElem(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _ => throw new IllegalStateException("unreachable")
  }

  protected def elemValue(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalStateException("unreachable")
  }
}

/** Σ aᵢ·bᵢ in double precision. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorElementSupport {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    checkArray(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => checkArray(right, prettyName)
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, lb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elementType(left), elementType(right))
    val n = math.min(la.numElements(), lb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elemValue(ta, la, i) * elemValue(tb, lb, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${readElem(elementType(left), a, i)} * ${readElem(elementType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** Σ aᵢ² in double precision. */
case class VectorNorm2(child: Expression)
    extends UnaryExpression with VectorElementSupport {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def checkInputDataTypes(): TypeCheckResult = checkArray(child, prettyName)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = elementType(child)
    var s = 0.0
    var i = 0
    while (i < arr.numElements()) {
      val v = elemValue(t, arr, i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${readElem(elementType(child), a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm2 =
    copy(child = newChild)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expr(a), Bridge.expr(b)))
  def norm2(a: Column): Column =
    Bridge.column(VectorNorm2(Bridge.expr(a)))
}
