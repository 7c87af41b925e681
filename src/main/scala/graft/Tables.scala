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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a long of
      // nanoseconds and convert to a microsecond TimestampType column
      // (integral `div` — a double division would lose precision above
      // 2^53 ns). DuckDB's TIMESTAMP_NS → TIMESTAMP cast truncates the
      // same way, so both engines see identical microsecond values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // normalize whatever the writer produced to a µs TimestampType:
      // TIMESTAMP(NANOS) arrives as a long of nanoseconds (the conf
      // above), NTZ writers (e.g. DuckDB COPY) arrive as TIMESTAMP_NTZ
      // (identical wall values under the UTC session), ordinary µs
      // TIMESTAMP needs nothing
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
