package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linked-list "NEXT" chains via `lead()` — the reference builds these with
  * sort + collect + UNWIND-pairs (W1: `/root/reference/src/queries/
  * season.py:19-27`, `game.py:42-50`, `game.py:744-769`, …). In Spark the
  * whole pattern is a single window function: no collect, no driver
  * round-trip, one shuffle on the chain's partition key.
  */
object Chains {

  /** For each row, adds `next_<c>` for every column in `carry` (values from
    * the successor row in (`keys`, ordered by `order`)), mirroring the
    * reference's `(:A)-[:NEXT]->(:A)` edges with their `time_since` /
    * `clock_delta` style properties computed by the caller from the carried
    * columns. Last row of each chain carries nulls (chain tail).
    */
  def next(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      carry: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    carry.foldLeft(df)((d, c) => d.withColumn(s"next_$c", lead(col(c), 1).over(w)))
  }

  /** Interval construction from ordered state-change rows (reference W2,
    * `game.py:110-125`): each row's interval ends where the next row starts,
    * with a configurable default end for the chain tail.
    */
  def tile(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      defaultEnd: Column,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(timeCol) +: tieBreak.map(col)): _*)
    df.withColumn("end_time", coalesce(lead(col(timeCol), 1).over(w), defaultEnd))
  }
}
