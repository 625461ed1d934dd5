package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.ReturnsFrame

/** Longest win/loss streaks, distributed via gaps-and-islands — replaces the
  * reference's driver-side loop `_consecutive_count`
  * (alphastats/stats.py:1249-1289). Nulls reset the streak (they form their
  * own sign class, breaking islands), matching alphastats/stats.py:1253-1255.
  */
object Streaks {

  def consecutive(returns: DataFrame, winning: Boolean,
      aggregate: Option[String], compounded: Boolean): DataFrame = {
    val bucketed = Calendar.simpleReturns(ReturnsFrame(returns), aggregate, compounded)
    val rfm = ReturnsFrame(bucketed)
    val (odf, ord) = rfm.withOrder
    val spark = returns.sparkSession
    val values = rfm.numericCols.map { c =>
      longestStreak(odf.select(ord.as("__ord"), col(c).as("__v")), winning)
    }
    val schema = StructType(rfm.numericCols.map(c => StructField(c, LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(values)), schema)
  }

  /** Longest run of >0 (or <0) in a 2-col frame (__ord, __v). */
  private def longestStreak(df: DataFrame, winning: Boolean): Long = {
    val sign = when(col("__v").isNull, lit(2))
      .when(col("__v") > 0, lit(1))
      .when(col("__v") < 0, lit(-1))
      .otherwise(lit(0))
    val target = if (winning) 1 else -1
    val w = Window.orderBy("__ord")
    val ws = Window.partitionBy("__sign").orderBy("__ord")
    val islands = df.select(col("__ord"), sign.as("__sign"))
      .withColumn("__island", row_number().over(w) - row_number().over(ws))
      .filter(col("__sign") === target)
    islands.groupBy("__island").count()
      .agg(coalesce(max("count"), lit(0L)))
      .head().getLong(0)
  }
}
