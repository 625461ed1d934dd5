package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalized view of a "returns frame": the reference's single table shape —
  * any numeric column is a return series, at most one temporal column is the
  * time axis (reference: alphastats/_utils.py:10-22).
  *
  * Normalization applied once at construction: NaN → null on every
  * floating-point column, so "missing" is uniformly null and every aggregate
  * skips it (reference: alphastats/_utils.py:34 `fill_nan(None)`).
  */
final class ReturnsFrame private (
    val df: DataFrame,
    val numericCols: Seq[String],
    val temporalCol: Option[String]) {

  def requireTemporal: String = temporalCol.getOrElse(throw NoTemporalColumnError())

  /** One aggregate per numeric column, keyed by the original column name —
    * the reference's 1-row-frame output contract (alphastats/stats.py:39-41).
    */
  def aggAll(f: Column => Column): DataFrame =
    df.select(numericCols.map(c => f(col(c)).as(c)): _*)

  /** Per-column aggregates where the builder also needs the column NAME
    * (e.g. to alias interior window columns uniquely).
    */
  def aggAllNamed(f: (Column, String) => Column): DataFrame =
    df.select(numericCols.map(c => f(col(c), c).as(c)): _*)

  /** (frame-with-order-column, order column). Uses the temporal column when
    * present; otherwise falls back to ingestion order via
    * monotonically_increasing_id — the reference relies on implicit row
    * order for its no-temporal path, which only exists at driver scale.
    */
  def withOrder: (DataFrame, Column) = temporalCol match {
    case Some(t) => (df, col(t))
    case None => (df.withColumn(ReturnsFrame.RowIdx, monotonically_increasing_id()),
      col(ReturnsFrame.RowIdx))
  }
}

object ReturnsFrame {
  val RowIdx = "__graft_row_idx"
  val BenchmarkCol = "_benchmark_returns"

  private def isTemporal(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  def apply(input: DataFrame): ReturnsFrame = {
    val numeric = input.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    val temporal = input.schema.fields.collect {
      case f if isTemporal(f.dataType) => f.name
    }.toSeq
    if (temporal.length > 1) throw MultipleTemporalColumnsError(temporal)

    val cleaned = input.select(input.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
    new ReturnsFrame(cleaned, numeric, temporal.headOption)
  }

  /** Validate + normalize a benchmark frame: exactly one numeric column,
    * renamed to `_benchmark_returns` (reference: alphastats/_utils.py:44-57).
    */
  def prepareBenchmark(input: DataFrame): ReturnsFrame = {
    val rf = apply(input)
    rf.numericCols match {
      case Seq() => throw NoReturnColumnError()
      case Seq(one) =>
        val cols = rf.temporalCol.toSeq.map(col) :+ col(one).as(BenchmarkCol)
        new ReturnsFrame(rf.df.select(cols: _*), Seq(BenchmarkCol), rf.temporalCol)
      case many => throw AmbiguousBenchmarkReturnsError(many)
    }
  }
}
