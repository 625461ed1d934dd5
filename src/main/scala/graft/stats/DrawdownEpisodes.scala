package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, StructField, StructType}

import graft.core.ReturnsFrame

/** Drawdown-episode metrics, distributed via gaps-and-islands — replaces the
  * reference's driver loops `_drawdown_period_lengths` / `avg_drawdown`
  * (alphastats/stats.py:1570-1642).
  *
  * Episode length is calendar days (end − start).days + 1 when a temporal
  * column exists, else the episode row count (alphastats/stats.py:1578-1594).
  */
object DrawdownEpisodes {

  def longestDays(returns: DataFrame): DataFrame =
    perColumn(returns, LongType) { ep =>
      ep.agg(coalesce(max("__len"), lit(0L))).head().getLong(0)
    }

  def avgDays(returns: DataFrame): DataFrame =
    perColumn(returns, DoubleType) { ep =>
      val v = ep.agg(avg("__len")).head()
      if (v.isNullAt(0)) 0.0 else v.getDouble(0)
    }

  def avgDepth(returns: DataFrame): DataFrame =
    perColumn(returns, DoubleType) { ep =>
      val v = ep.agg(avg("__depth")).head()
      if (v.isNullAt(0)) 0.0 else v.getDouble(0)
    }

  /** One row per drawdown episode for one column: (__len, __depth). */
  private def episodes(ddDf: DataFrame, ddCol: String, ord: Column,
      temporal: Boolean, dateTyped: Boolean): DataFrame = {
    val dd = col("__dd")
    val base = ddDf.select(ord.as("__ord"), col(ddCol).as("__dd"))
    val flag = (dd.isNotNull && dd < 0).as("__in")
    val w = Window.orderBy("__ord")
    val wf = Window.partitionBy("__in").orderBy("__ord")
    val islands = base.select(col("__ord"), dd, flag)
      .withColumn("__island", row_number().over(w) - row_number().over(wf))
      .filter(col("__in"))
    val len: Column =
      if (!temporal) count(lit(1))
      else if (dateTyped) (datediff(max("__ord"), min("__ord")) + 1).cast("long")
      else floor((max(col("__ord").cast("long")) - min(col("__ord").cast("long"))) / 86400L) + 1
    islands.groupBy("__island")
      .agg(len.as("__len"), min("__dd").as("__depth"))
  }

  private def perColumn[T](returns: DataFrame, dt: org.apache.spark.sql.types.DataType)(
      agg: DataFrame => T): DataFrame = {
    val rfm = ReturnsFrame(returns)
    val (ddDf, ddName) = Stats.withDrawdownCols(rfm)
    val (odf, ord) = (ddDf, rfm.temporalCol.map(col).getOrElse(col(ReturnsFrame.RowIdx)))
    val dateTyped = rfm.temporalCol.exists(t =>
      returns.schema(t).dataType == DateType)
    val values = rfm.numericCols.map { c =>
      agg(episodes(odf, ddName(c), ord, rfm.temporalCol.isDefined, dateTyped))
        .asInstanceOf[Any]
    }
    val schema = StructType(rfm.numericCols.map(c => StructField(c, dt, nullable = false)))
    returns.sparkSession.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(values)), schema)
  }
}
