package graft.queries

import graft.{Q, Tables}
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.functions._

/** GraphX-backed analytics queries (BASELINE.json: "GraphX for analytics
  * queries") over the star schema viewed as a property graph:
  * customer→nation and supplier→nation edges, nation→region hierarchy.
  * Results come out of GraphX operators (degrees, connectedComponents) but
  * are relationally well-defined, so they stay oracle-checkable.
  *
  * Vertex id scheme: nations keep their keys (< 1000), regions live at
  * 1000 + regionkey — disjoint ranges, so component ids (GraphX: min
  * vertex id in component) are predictable.
  */
object Graphs {

  // ---------------------------------------------------------------- q50
  /** Entity degree via GraphX: for each nation, the number of customer
    * and supplier edges pointing at it (the graph form of a fact-count
    * roll-up). */
  val q50GraphDegree: Q = Q.sql(
    "q50_graph_degree",
    """SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
      |  CAST(COALESCE(c.n, 0) + COALESCE(s.n, 0) AS BIGINT) AS degree
      |FROM nation
      |LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY 1) c
      |  ON c.c_nationkey = n_nationkey
      |LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY 1) s
      |  ON s.s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val spark = s
    val nation = Tables(s, dir, "nation")
    val customer = Tables(s, dir, "customer")
    val supplier = Tables(s, dir, "supplier")
    val vertices = nation
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .rdd.map(r => (r.getLong(0): VertexId, r.getString(1)))
    val custEdges = customer
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .rdd.map(r => Edge(1000000L + r.getLong(0), r.getLong(1), "IN_NATION"))
    val suppEdges = supplier
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .rdd.map(r => Edge(2000000L + r.getLong(0), r.getLong(1), "IN_NATION"))
    val graph = Graph.fromEdges(custEdges.union(suppEdges), defaultValue = "")
    val degrees = graph.inDegrees // (nationkey, degree) — only nation vertices have in-edges
    import spark.implicits._
    val degDf = degrees.toDF("nationkey", "deg")
    nation.select(col("n_nationkey").cast("long").as("nationkey"))
      .join(degDf, Seq("nationkey"), "left_outer")
      .select(col("nationkey"),
        coalesce(col("deg").cast("long"), lit(0L)).as("degree"))
  }

  // ---------------------------------------------------------------- q51
  /** Connected components via GraphX over the nation–region bipartite
    * graph: each component is one region's nation cluster; GraphX labels
    * a component with its minimum vertex id = the region's smallest
    * nation key (nation ids < region ids by construction). */
  val q51GraphComponents: Q = Q.sql(
    "q51_graph_components",
    """SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
      |  CAST(MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS component
      |FROM nation""".stripMargin) { (s, dir) =>
    val spark = s
    val nation = Tables(s, dir, "nation")
    val edges = nation
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), 1000L + r.getLong(1), "IN_REGION"))
    val graph = Graph.fromEdges(edges, defaultValue = 0)
    import spark.implicits._
    val cc = graph.connectedComponents().vertices
      .filter(_._1 < 1000L) // keep nation vertices
      .toDF("nationkey", "component_raw")
    cc.select(col("nationkey"),
      col("component_raw").cast("long").as("component"))
  }

  val all: Seq[Q] = Seq(q50GraphDegree, q51GraphComponents)
}
