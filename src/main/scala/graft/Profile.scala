package graft

import org.apache.spark.sql.SparkSession

/** Phase profiler for the domain pipeline + PyG export — breaks the
  * bench's heavy lines (q60/q61/q64) into their constituent actions so
  * optimization targets measurements, not guesses.
  *
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle fan-out must scale with the DATA, not the thread count:
    // the round-10 q116 1000× attempt OOM'd 81 min in (8 GiB heap, 32
    // partitions) because per-partition shuffle volume grows 10× per
    // decade when the partition count is pinned — the spill-merge
    // working set (read-ahead buffers × spill-file count) outgrew the
    // heap exactly as it would on a real cluster with too-few shuffle
    // partitions. A cluster deployment provisions
    // spark.sql.shuffle.partitions ∝ input size and lets AQE coalesce
    // the small stages back down; SPARK_GRAFT_SHUFFLE_PARTITIONS is
    // that knob for the scaling harness (default: thread count, the
    // bench-session shape).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // The refined (per-stage) form of the same knob: leave
    // shuffle.partitions alone and raise AQE's pre-coalesce partition
    // count instead, so every exchange right-sizes BY BYTES — corpus-
    // scale shuffles keep a high fan-out while iteration-scale ones
    // (the GraphX CC feeders that crawled at a blanket 512) coalesce
    // back to a handful of tasks. Unset = Spark default (= the final
    // shuffle.partitions value), i.e. behavior unchanged.
    //
    // ROUND-11 DEFAULT PROTOCOL for scaling runs (BASELINE.md "q116
    // third decade"): SPARK_GRAFT_INITIAL_PARTITIONS=512 with 32
    // shuffle partitions and SPARK_DRIVER_MEM=16g — the one shape that
    // avoids both measured failure modes (the pinned-32p heap OOM at
    // 1000×, the blanket-512p small-stage crawl at 100×). See
    // scripts/q116_third_decade.sh for the committed campaign form.
    val initialPartitions = sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
    val spark = initialPartitions.fold(spark0)(n => spark0
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // measurement toggle ONLY (never set in Bench/Verify): quantify how
      // much of a heavy line is AQE per-stage job-scheduling overhead
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("GRAFT_NO_AQE")).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", Scratch.root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def time(label: String)(f: => Long): Unit = {
      val j0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      val jobs = sc.statusTracker.getJobIdsForGroup(null).length - j0
      println(f"[profile] $label%-34s ${dt}%7.2fs  rows=$n%-9d jobs=$jobs")
    }
    // warm up
    spark.read.parquet(s"$sfDir/region.parquet").count()

    if (args.length > 1 && args(1) == "queries") {
      // bench-mirror mode: run registered queries in bench order; an
      // optional third arg names an explicit comma-separated subset so a
      // regression can be isolated from cross-query session state
      val sel: Q => Boolean =
        if (args.length > 2) { val names = args(2).split(",").toSet
          q => names.contains(q.name) }
        else q => q.name >= "q60"
      Registry.all.filter(sel).sortBy(_.name).foreach { q =>
        time(q.name)(Force(q.run(spark, sfDir)))
      }
      spark.stop()
      return
    }

    val p = queries.Domain.pipeline(spark, sfDir)
    time("periods (cache fill)")(p.periods.count())
    time("lineupStints (cache fill)")(p.lineupStints.count())
    time("playerStints (cache fill)")(p.playerStints.count())
    time("attributedEvents (cache fill)")(p.attributedEvents.count())
    time("stintPlusMinus")(p.stintPlusMinus.count())
    time("scoreChain")(p.scoreChain.count())
    time("q62 playerPlusMinus")(p.playerPlusMinus.count())
    time("reboundLinks")(p.reboundLinks.count())
    time("timeline")(p.timeline.count())
    time("pyg build + edges count")(queries.Domain.pyg(spark, sfDir)._2.count())
    time("pyg nodes count (cached)")(queries.Domain.pyg(spark, sfDir)._1.count())
    time("q64 re-count (all cached)")(queries.Domain.pyg(spark, sfDir)._2.count())
    spark.stop()
  }
}
