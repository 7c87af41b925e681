package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion utilities mirroring the reference's scan surface (SURVEY
  * §2.1): nested-JSON event feeds (S6, `pbp["game"]["actions"]`,
  * `/root/reference/src/fetcher.py:100-115`) and the header-zip tabular
  * JSON shape (S1, `resultSets[0]` headers×rows zip,
  * `src/fetcher.py:26-28`) — both as pure column programs over staged
  * JSON, no driver-side loops.
  */
object Sources {

  /** Parse a column of JSON documents shaped `{"game": {"actions": [...]}}`
    * into one row per action (S6). `actionSchema` types the array
    * elements; unknown fields are dropped by `from_json` (permissive). */
  def jsonActions(raw: DataFrame, jsonCol: String, actionSchema: StructType): DataFrame = {
    val docSchema = new StructType()
      .add("game", new StructType()
        .add("actions", org.apache.spark.sql.types.ArrayType(actionSchema)))
    raw
      .withColumn("__doc", from_json(col(jsonCol), docSchema))
      .select(explode(col("__doc.game.actions")).as("action"))
      .select(col("action.*"))
  }

  /** The header-zip pattern (S1): a result-set document carrying parallel
    * `headers` and row arrays becomes a map column per row —
    * `arrays_zip`/`map_from_arrays`, the columnar form of the reference's
    * Python `dict(zip(headers, row))`. */
  def headerZip(raw: DataFrame, headersCol: String, rowsCol: String): DataFrame =
    raw
      .select(col(headersCol).as("__h"), explode(col(rowsCol)).as("__r"))
      .select(map_from_arrays(col("__h"), col("__r")).as("record"))

  /** Regex column selection (S6's `df.filter(regex="Id$")`,
    * `src/fetcher.py:104`): driver-side schema pruning by name pattern. */
  def selectByPattern(df: DataFrame, pattern: String): DataFrame = {
    val re = pattern.r
    val cols = df.columns.filter(c => re.findFirstIn(c).isDefined)
    df.select(cols.map(col).toSeq: _*)
  }
}

/** Parquet sink with the reference's idempotency contract (§1.4):
  * deterministic recompute + partitioned overwrite replaces Neo4j's
  * `MERGE … ON CREATE SET` upserts. Partitioning by the natural unit of
  * parallelism (`game_id` in the domain pipeline) is what makes the
  * 1,230-games-per-season — or 100 TB archive — case embarrassingly
  * parallel on read. */
object Sink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
