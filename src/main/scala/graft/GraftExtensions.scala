package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{GraftProduct, VectorDot, VectorNorm2}

/** Spark session extension: registers graft's custom Catalyst functions for
  * SQL use. Attach at session build time with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[Graft.register]] on an existing session.
  *
  * Functions:
  *  - `graft_product(x)`: exact multiplicative aggregate (Π x over non-null
  *    x, null on empty) — the compounding primitive; usable as a plain
  *    aggregate and as a running window function.
  *  - `graft_dot(a, b)` / `graft_norm2(a)`: codegen'd double-precision
  *    vector math over array<float|double> embedding columns.
  *  - `graft_langid(text)`: char-trigram Naive-Bayes language prediction
  *    ([[graft.ext.LangId.predictCol]] — the row-local form; for bulk
  *    corpus scoring prefer the DataFrame API's broadcast-join
  *    [[graft.ext.LangId.classify]]).
  *  - `graft_bpe_word_tokens(word)`: exact BPE token count of ONE
  *    pre-token under the embedded merges table
  *    ([[graft.ext.Bpe.tokenCountCol]]; corpus accounting should go
  *    through [[graft.ext.Bpe.docTokenCounts]]'s distinct-word dictionary).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_product"),
      new ExpressionInfo(classOf[GraftProduct].getName, "graft_product"),
      (children: Seq[Expression]) => GraftProduct(children.head)),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))),
    (FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[VectorNorm2].getName, "graft_norm2"),
      (children: Seq[Expression]) => VectorNorm2(children.head)),
    (FunctionIdentifier("graft_langid"),
      new ExpressionInfo(graft.ext.LangId.getClass.getName, "graft_langid"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.graft.SqlBridge
        SqlBridge.convertedExpr(graft.ext.LangId.predictCol(SqlBridge.column(children.head)))
      }),
    (FunctionIdentifier("graft_bpe_word_tokens"),
      new ExpressionInfo(graft.ext.Bpe.getClass.getName, "graft_bpe_word_tokens"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.graft.SqlBridge
        SqlBridge.convertedExpr(graft.ext.Bpe.tokenCountCol(SqlBridge.column(children.head)))
      }))
}

/** Imperative registration for sessions built without the extension. */
object Graft {
  def register(spark: SparkSession): Unit =
    GraftExtensions.descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
