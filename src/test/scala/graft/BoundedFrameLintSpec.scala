package graft

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide structural lint for single-reducer shapes (round-9
  * hardening item): an unpartitioned `Window.orderBy` plans ONE task no
  * matter the cluster, so it is only admissible over a frame that stays
  * bounded as the corpus grows. Until now each of the ~20 such sites was
  * justified ad hoc in scaladoc ("vocab-bounded", "decile histogram",
  * "≤256 buckets"); this spec makes the claim machine-checked, two ways:
  *
  *  1. STRUCTURAL: every global-Window node in every registered query's
  *     optimized plan must take its input through a frame-collapsing
  *     construct — an Aggregate, an explicit Limit, or a local/bounded
  *     relation — on every path to a leaf. A global window directly over
  *     a corpus scan (the red fixture) fails the build.
  *  2. GROWTH: a collapsing construct is not enough — `GROUP BY custkey`
  *     collapses nothing at scale. So for every global window the lint
  *     EXECUTES the window's input subtree at sf0.001 and sf0.01 (10×
  *     corpus) and requires the frame's cardinality to grow by < 5× —
  *     bounded frames (vocab, deciles, hash buckets, quantile grids) ride
  *     well under that; anything tracking corpus entities rides at ~10×
  *     and must either be respelled (q93/q94b's hash-partitioned or
  *     histogram spellings) or carry an entry in [[growthJustified]]
  *     with the documented at-scale escape hatch.
  *
  * Global Sorts are out of scope by construction: Catalyst eliminates
  * non-terminal global sorts (`EliminateSorts`), terminal ones plan as
  * RangePartitioning — parallel, not single-reducer — and limit+sort
  * fuses to TakeOrdered.
  */
object BoundedFrameLint {
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.joins.BaseJoinExec
  import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.{GlobalLimitExec, CollectLimitExec, LocalLimitExec, TakeOrderedAndProjectExec, LocalTableScanExec, UnaryExecNode, UnionExec}

  private val LimitCap = 1000000L

  /** Is this logical subtree's cardinality decoupled from the corpus by
    * construction? (Aggregate = one row per group; the group-DOMAIN
    * boundedness is what the growth gate checks at runtime.) */
  def isBounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case g: GlobalLimit =>
      g.maxRows.forall(_ <= LimitCap)
    case l: LocalLimit => isBounded(l.child)
    case _: LocalRelation | _: OneRowRelation => true
    case r: Range => r.numElements <= LimitCap
    case h: ResolvedHint => isBounded(h.child)
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => isBounded(j.left)
      case _ => j.children.forall(isBounded)
    }
    case u: Union => u.children.forall(isBounded)
    case imr: InMemoryRelation => isBoundedExec(imr.cachedPlan)
    case u: UnaryNode => isBounded(u.child)
    case _ => false
  }

  /** Physical mirror of [[isBounded]] — needed because a cached frame
    * surfaces in the optimized plan as an InMemoryRelation leaf whose
    * provenance is a SparkPlan. */
  def isBoundedExec(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    case l: LocalLimitExec => isBoundedExec(l.child)
    case _: LocalTableScanExec => true
    case j: BaseJoinExec => j.joinType match {
      case LeftSemi | LeftAnti => isBoundedExec(j.left)
      case _ => j.children.forall(isBoundedExec)
    }
    case u: UnionExec => u.children.forall(isBoundedExec)
    case a: AdaptiveSparkPlanExec => isBoundedExec(a.inputPlan)
    case q: QueryStageExec => isBoundedExec(q.plan)
    case r: ReusedExchangeExec => isBoundedExec(r.child)
    case i: InMemoryTableScanExec => isBoundedExec(i.relation.cachedPlan)
    case u: UnaryExecNode => isBoundedExec(u.child)
    case _ => false
  }

  /** Global-Window nodes of a frame's optimized plan, in tree order. */
  def globalWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }

  def structuralOffenders(df: DataFrame): Seq[Window] =
    globalWindows(df).filterNot(w => isBounded(w.child))

  /** Execute each global window's INPUT subtree and return its row
    * count — the measured frame size the single task would sort. */
  def windowInputCounts(spark: SparkSession, df: DataFrame): Seq[Long] =
    globalWindows(df).map(w => GraftBridge.dataset(spark, w.child).count())
}

class BoundedFrameLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dirSmall = "/root/testdata/sf0.001"
  private val dirBig = "/root/testdata/sf0.01"

  /** Queries whose global windows take input that is not structurally
    * frame-collapsed (no Aggregate/Limit on every leaf path) — each entry
    * records why the frame is nonetheless bounded, and the growth gate
    * below still measures it. */
  private val structuralJustified: Map[String, String] = Map(
    "q178_skyline" -> ("final pass input is band-prune + per-band-skyline " +
      "FILTER output — O(bands · log n) expected, not expressible as an " +
      "Aggregate; growth-gated below"),
    "q214_ivm_retract" -> ("the corpus rank windows are the SYNTHETIC CDC " +
      "derivation only (deterministic replayable base/log split); a real " +
      "changefeed carries its target keys and the maintained path never " +
      "rescans — documented in the query scaladoc"))

  /** Queries whose global-window frame tracks a corpus-entity dimension
    * (measured ≥ 5× across the sf0.001 → sf0.01 decade) — each entry
    * documents the at-scale escape hatch a 100 TB user applies. Adding a
    * NEW query here requires the same justification review; adding one
    * silently fails the growth test. */
  private val growthJustified: Map[String, String] = Map(
    "q214_ivm_retract" -> ("synthetic CDC scaffolding (see " +
      "structuralJustified) — the maintained view path itself is " +
      "partial-agg only"),
    "q236_kaplan_meier" -> ("frame = distinct observed durations, bounded " +
      "by the feed's TIME SPAN in hours; the fixture grows the clock with " +
      "SF while a real corpus grows width at a calendar-bounded span — " +
      "the constant-density fixture measures this regime"))

  // discovery pass: build (and for streaming gates, run) every registered
  // query once at sf0.001; keep only those with global windows
  private lazy val withGlobalWindows: Seq[(Q, Seq[Window])] =
    Registry.all.map { q =>
      q -> BoundedFrameLint.globalWindows(q.run(spark, dirSmall))
    }.filter(_._2.nonEmpty)

  test("red fixture: a global window directly over the corpus is flagged") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val red = Tables(spark, dirSmall, "events")
      .withColumn("rn", row_number().over(W.orderBy(col("event_id"))))
    val off = BoundedFrameLint.structuralOffenders(red)
    assert(off.nonEmpty, "lint must flag a corpus-scan global window")
    // and the bounded twin passes: same window over a global aggregate
    val green = Tables(spark, dirSmall, "events")
      .groupBy(col("event_type")).count()
      .withColumn("rn", row_number().over(W.orderBy(col("count").desc)))
    assert(BoundedFrameLint.structuralOffenders(green).isEmpty)
  }

  test("red fixture: an entity-tracking aggregate frame is caught by the growth gate") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    def perUser(dir: String) = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("q", ntile(4).over(W.orderBy(col("n"), col("user_id"))))
    // structurally fine (Aggregate below the window)…
    assert(BoundedFrameLint.structuralOffenders(perUser(dirSmall)).isEmpty)
    // …but the frame is |users| — it must grow ~10× with the corpus,
    // which is exactly what the growth gate rejects
    val small = BoundedFrameLint.windowInputCounts(spark, perUser(dirSmall))
    val big = BoundedFrameLint.windowInputCounts(spark, perUser(dirBig))
    assert(small.size == 1 && big.size == 1)
    assert(big.head >= 5 * small.head,
      s"fixture lost its point: ${small.head} -> ${big.head}")
  }

  test("every registered query: global windows sit over frame-collapsing input") {
    val bad = Registry.all.flatMap { q =>
      val off = BoundedFrameLint.structuralOffenders(q.run(spark, dirSmall))
      if (off.isEmpty || structuralJustified.contains(q.name)) Nil
      else Seq(s"${q.name}: ${off.map(_.simpleString(80)).mkString(" | ")}")
    }
    assert(bad.isEmpty,
      s"global windows over non-collapsed input:\n${bad.mkString("\n")}")
    val stale = structuralJustified.keySet --
      Registry.all.map(_.name).toSet
    assert(stale.isEmpty, s"structuralJustified entries without a query: $stale")
  }

  test("global-window input frames stay bounded across a corpus decade") {
    val findings = withGlobalWindows.map { case (q, _) =>
      val small = BoundedFrameLint.windowInputCounts(spark, q.run(spark, dirSmall))
      val big = BoundedFrameLint.windowInputCounts(spark, q.run(spark, dirBig))
      (q.name, small, big)
    }
    val offenders = findings.filter { case (name, small, big) =>
      !growthJustified.contains(name) &&
        small.zipAll(big, 0L, 0L).exists { case (s, b) =>
          b >= 5 * math.max(s, 1L) && b > 50
        }
    }
    assert(offenders.isEmpty,
      "global-window frames growing with the corpus (respell or justify " +
        "in growthJustified):\n" +
        offenders.map { case (n, s, b) =>
          s"$n: ${s.mkString(",")} -> ${b.mkString(",")}"
        }.mkString("\n"))
    // allowlist hygiene: no stale entries
    val stale = growthJustified.keySet -- findings.map(_._1).toSet
    assert(stale.isEmpty, s"growthJustified entries without a query: $stale")
  }
}
