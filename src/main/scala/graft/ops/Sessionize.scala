package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-and-island sessionization — the reference's PlayerStint pattern
  * (W3, `/root/reference/src/queries/game.py:144-168`): flag a new run when
  * the gap from the previous row exceeds a threshold, then number runs with
  * a running sum of flags.
  *
  * One shuffle on `keys`, one per-partition sort — the canonical
  * linear-scaling sessionizer. At 100 TB the only knob that matters is that
  * `keys` has enough cardinality to spread partitions (user_id does).
  */
object Sessionize {

  /** Adds a `session_id` column (1-based, per key group, ordered by
    * `timeCol` then `tieBreak`). A new session starts when the gap from the
    * previous row strictly exceeds `gapMicros`.
    *
    * The time axis may be a timestamp column (gap in microseconds) or a
    * plain numeric column (gap in the column's own units) — detected from
    * the column type, mirroring [[AsOf.join]].
    */
  def apply(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      gapMicros: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(timeCol) +: tieBreak.map(col)): Seq[org.apache.spark.sql.Column]
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTimestamp = df.schema(timeCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    def axis(c: org.apache.spark.sql.Column) =
      if (isTimestamp) unix_micros(c) else c
    df.withColumn("__prev_t", lag(col(timeCol), 1).over(w))
      .withColumn(
        "__new",
        when(
          col("__prev_t").isNull ||
            axis(col(timeCol)) - axis(col("__prev_t")) > gapMicros,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .drop("__prev_t", "__new")
  }
}
