package graft.tools

/** Standalone host-window probe: the SAME three yardsticks Bench embeds
  * in its JSON (single-thread cpu Mops, all-cores par Mops, fsync io
  * MB/s) without starting a SparkSession, plus the committed-tier match,
  * so campaign scripts can poll for a healthy window BEFORE committing
  * to a ~12-minute full-surface run or a multi-hour scaling leg. The
  * round-11 evening is the motivating record: three full-bench attempts
  * all carried healthy builder-volume io (304-381 MB/s) but contended
  * cpu (434-454 Mops vs the builder tier's >= 470) — an axis the
  * dd-only probe in scripts/q116_third_decade.sh cannot see, so each
  * attempt burned ~12 minutes to learn what a ~5-second cpu probe
  * would have said up front.
  *
  * Usage:
  *   java -cp <jar>:/opt/spark/jars/'*' graft.tools.WindowProbe [probeDir]
  *
  * Prints one line, e.g.:
  *   cpu=478 par=14520@32 io=433.8 tier=builder
  * and exits 0 when the reading lands in a committed tier with the par
  * band satisfied (promotable window), 1 otherwise — so shell loops can
  * `until WindowProbe; do sleep ...; done`.
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp"
    val cpu = graft.Bench.cpuCalibrationMops()
    val par = graft.Bench.cpuCalibrationParMops()
    val io = graft.Bench.ioCalibrationMbps(dir)
    val threads = graft.Bench.parCalibrationThreads
    val tier = graft.Bench.tierOf(cpu, io).map(_.name).getOrElse("none")
    val ok = graft.Bench.withinEnvelope(io, cpu, par, threads)
    println(graft.Bench.num("cpu=%.0f", cpu) +
      graft.Bench.num(" par=%.0f", par) + s"@$threads" +
      graft.Bench.num(" io=%.1f", io) + s" tier=$tier healthy=$ok")
    if (!ok) sys.exit(1)
  }
}
