package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE right-size partitions inside cached plans: small cached
      // frames coalesce to few partitions, huge ones keep parallelism --
      // the scale-adaptive alternative to hand-tuned coalesce() calls
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // coalesce post-shuffle partitions by byte size, not parallelism:
      // tiny intermediate shuffles collapse to single-task stages while a
      // 100 TB shuffle still fans out to thousands of partitions
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // same session semantics as Verify: TIMESTAMP_NTZ casts and epoch
      // math are session-TZ dependent — bench must execute the verified plan
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // single-node harness: scratch I/O on tmpfs so host writeback
      // throttling can't masquerade as engine time (see graft.Scratch)
      .config("spark.local.dir", Scratch.root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session machinery (codegen compiler, parquet reader, shuffle)
    // so the first measured query isn't billed for one-time init
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(100)
      .groupBy((org.apache.spark.sql.functions.col("id") % 4).as("k"))
      .count().collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be visible as a failure, never as a timing
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // escape like Verify.q(): ANY control char would invalidate the JSON
    val errs = results.collect { case (k, _, Some(m)) =>
      val clean = m.map(c => if (c == '"' || c == '\\' || c < ' ') ' ' else c)
      "\"" + k + "\":\"" + clean + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFail = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":$nFail,"sf":"$sfDir"}""")
    spark.stop()
  }
}
