package graft.ops

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed metric-space kernels shared by the spatial join (q180)
  * and grid DBSCAN (q277), with the coordinate DOMAIN parameterized.
  *
  * Why the parameter exists (round-9 measurement item): the uniform
  * replica blow-up grows population over a FIXED domain, so per-cell
  * occupancy — and with it every density-sensitive cost — grows linearly
  * with the corpus. A real corpus mostly grows its map at roughly
  * constant density. The registered queries pin domain = 10⁶ (their
  * DuckDB oracles encode the same constant); the constant-density
  * measurement twin (`graft.tools.DensityProfile`) passes
  * domain = 10⁶·√F so cell count scales with population and occupancy
  * stays constant.
  */
object Spatial {

  /** Deterministic synthetic points for an id frame: md5-derived
    * coordinates on the [0, domain)² grid — engine-portable (the house
    * 60-bit hash mod the domain, replayable by DuckDB). */
  def points(ids: DataFrame, idCol: String, domain: Long): DataFrame =
    ids.select(col(idCol),
      (Text.baseHash(concat(lit("x"), col(idCol).cast("string")))
        % domain).as("x"),
      (Text.baseHash(concat(lit("y"), col(idCol).cast("string")))
        % domain).as("y"))

  /** All DIRECTED point pairs within L∞ radius r (a ≠ b), generated
    * exactly once each — in the right point's home cell — via the
    * classic 3×3 grid-cell equi-join (cell size = r makes the
    * neighborhood sufficient) with the exact residual filter. Columns:
    * (cx, cy, ua, ax, ay, ub, bx, by). Never an all-pairs theta join;
    * constant 9× left fan-out, selectivity = cell occupancy. */
  def gridNeighbors(pts: DataFrame, r: Long): DataFrame = {
    val offsets = explode(array((-1 to 1).flatMap(i =>
      (-1 to 1).map(j => struct(lit(i.toLong).as("oi"),
        lit(j.toLong).as("oj")))): _*)).as("o")
    val left = pts.select(col(pts.columns.head).as("ua"),
        col("x").as("ax"), col("y").as("ay"), offsets)
      .select(col("ua"), col("ax"), col("ay"),
        (expr(s"ax div $r") + col("o.oi")).as("cx"),
        (expr(s"ay div $r") + col("o.oj")).as("cy"))
    val right = pts.select(col(pts.columns.head).as("ub"),
      col("x").as("bx"), col("y").as("by"),
      expr(s"bx div $r").as("cx"), expr(s"by div $r").as("cy"))
    left.join(right, Seq("cx", "cy"))
      .filter(col("ua") =!= col("ub") &&
        abs(col("ax") - col("bx")) <= r &&
        abs(col("ay") - col("by")) <= r)
  }

  /** Grid-bucketed DBSCAN over synthetic points (see q277's scaladoc for
    * the full semantics and the cell-contraction argument): cores =
    * points with ≥ minPts neighbors within L∞ r (self included), core
    * components over the CELL-CONTRACTED graph (exact: same-cell cores
    * are a clique at cell size = r), borders join their min-labeled
    * reachable component. Returns (user_id, is_core, cluster). */
  def gridDbscan(pts: DataFrame, r: Long, minPts: Long): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    def cand = gridNeighbors(pts, r)
    // scan 1: neighbor counts — per (point, cell) then per point
    val nc = cand.groupBy(col("ua")).agg(count(lit(1)).as("nn"))
    val core = pts.join(nc, col("user_id") === col("ua"), "left")
      .select(col("user_id"),
        (coalesce(col("nn"), lit(0L)) + 1L >= minPts).as("is_core"))
      .localCheckpoint() // small (one row per point); many consumers
    val coreIds = core.filter(col("is_core")).select(col("user_id"))
    // cell representative = min core id per cell
    val cellRep = pts
      .join(coreIds.select(col("user_id").as("cid")),
        col("user_id") === col("cid"))
      .select(col("cid"), expr(s"x div $r").as("cx"),
        expr(s"y div $r").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(min(col("cid")).as("rep"))
    // scan 2: distinct (point, cell-holding-a-core-neighbor) pairs
    val touched = cand
      .join(broadcast(coreIds.select(col("user_id").as("ub"))),
        Seq("ub"))
      .select(col("ua"), col("cx"), col("cy")).distinct()
      .join(broadcast(cellRep), Seq("cx", "cy"))
      .select(col("ua"), col("rep"))
      .localCheckpoint() // ≤9 rows per point; edges + borders read it
    val coreTouch = touched
      .join(coreIds.select(col("user_id").as("ua")), Seq("ua"))
    val vertsRdd = coreIds.rdd.map(r0 => (r0.getLong(0), 0))
    val edgesRdd = coreTouch.select(col("ua"), col("rep")).rdd
      .map(r0 => Edge(r0.getLong(0), r0.getLong(1), 0))
    val lab = Graph(vertsRdd, edgesRdd).connectedComponents()
      .vertices.toDF("core_id", "cluster")
    // border label = min component label over touched cells: cores
    // within one cell share a component, so the cell rep's label IS
    // every same-cell neighbor's label
    val bord = touched
      .join(coreIds.select(col("user_id").as("ua")), Seq("ua"),
        "left_anti")
      .join(lab.select(col("core_id").as("rep"), col("cluster")),
        Seq("rep"))
      .groupBy(col("ua")).agg(min(col("cluster")).as("b_cluster"))
    core
      .join(lab.select(col("core_id").as("user_id"),
        col("cluster").as("c_cluster")), Seq("user_id"), "left")
      .join(bord.select(col("ua").as("user_id"), col("b_cluster")),
        Seq("user_id"), "left")
      .select(col("user_id"), col("is_core"),
        coalesce(col("c_cluster"), col("b_cluster")).cast("long")
          .as("cluster"))
  }
}
