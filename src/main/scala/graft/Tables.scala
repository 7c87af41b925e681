package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet star schema (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. Reads go through
  * `spark.read.parquet` so Catalyst performs predicate pushdown and column
  * pruning against the scan — on a 100 TB dataset these would be
  * partitioned directories and the same call sites would prune partitions.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize whatever the writer produced for `ts` to a µs
    * TimestampType: TIMESTAMP(NANOS) arrives as a long of nanoseconds
    * (under `nanosAsLong`; integral `div` — a double division would lose
    * precision above 2^53 ns; DuckDB's TIMESTAMP_NS → TIMESTAMP cast
    * truncates the same way), NTZ writers (e.g. DuckDB COPY) arrive as
    * TIMESTAMP_NTZ (identical wall values under the UTC session),
    * ordinary µs TIMESTAMP needs nothing. Shared by the batch reader and
    * the streaming feed source. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a long of
      // nanoseconds and normalize to a microsecond TimestampType column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
