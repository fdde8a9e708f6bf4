package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact triangle counting over an undirected graph —
  * the third member of the graph family (components answer "which nodes
  * belong together", PageRank/TrustRank "which node matters", triangles
  * "how CLUSTERED is each node's neighborhood"): per-node triangle
  * participation is the numerator of the local clustering coefficient,
  * the standard cohesion signal for community detection and for spotting
  * spam/bot subgraphs (organic neighborhoods close triangles, injected
  * ones don't).
  *
  * Algorithm: degree-ordered edge orientation (Chiba–Nishizeki / the
  * MapReduce formulation of Suri & Vassilvitskii, WWW 2011 "Counting
  * Triangles and the Curse of the Last Reducer"). Each undirected edge
  * is oriented from its lower-(degree, id) endpoint to the higher; every
  * triangle then has exactly ONE vertex with two out-edges into it, so
  *
  *   wedges  = oriented ⋈ oriented on the apex  (v1 < v2 dedupes)
  *   triangles = wedges ⋈ canonical edges on the closing pair
  *
  * counts each triangle once with NO post-hoc dedup, and the per-apex
  * out-degree is bounded by O(√(2m)) regardless of skew — the hub that
  * breaks the naive neighbor self-join (its wedge count is quadratic in
  * the raw degree) ranks HIGHEST, so all its edges point inward and it
  * generates no wedges at all.
  *
  * Exactness: pure integer counting over equi-joins — no floats, no
  * order dependence; the DuckDB oracle is the direct triple self-join
  * (small-SF affordable) and matches bit-for-bit.
  *
  * Scale posture: one node-sized degree aggregation, two node-sized
  * joins to attach endpoint degrees, one self-join shuffled on the apex
  * (groups bounded by the √(2m) orientation cap), one closing-pair
  * equi-join against the edge list, one map-side-combined count. The
  * node-sized result is localCheckpoint-truncated so downstream plans
  * don't re-embed the wedge pipeline.
  */
object Triangles {

  /** Per-node triangle participation over canonical undirected edges
    * (columns `a`, `b` with `a < b`, distinct, self-loop-free — the
    * caller's contract, checked cheaply here). Returns
    * (node, deg, tri_cnt) for every node on ≥1 triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b")).persist()
    // deg feeds BOTH endpoint joins and the final projection join —
    // persist the node-sized frame so the degree aggregation over the
    // edge list runs once, not three times (r14, guide §1.2)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist()
    // orient low (deg, node) -> high; ties broken by the node id so the
    // orientation is a strict total order (a == b is excluded upstream)
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"))
      .persist()
    // r14 (guide §2.3 — shuffle the proxy, not the expansion): triangles
    // are counted by ADJACENCY-ARRAY INTERSECTION per oriented edge
    // instead of materializing the wedge expansion through an exchange
    // and closing it against the edge list. For each oriented edge
    // (u→x), every w ∈ N⁺(u) ∩ N⁺(x) closes exactly one triangle —
    // apex u (two out-edges u→x, u→w) with the third edge oriented
    // x→w — so each triangle still surfaces exactly once, from its
    // apex's lowest-ordered out-edge. Shuffled bytes are now bounded by
    // the adjacency lists (edge-sized, √(2m)-capped per node) rather
    // than the wedge count (output ≫ input); the intersection itself is
    // in-row hash-set work inside the join stage.
    val adj = oriented.groupBy(col("u"))
      .agg(collect_list(col("v")).as("nb")).persist()
    val tris = oriented
      .join(adj.select(col("u"), col("nb").as("__nu")), "u")
      .join(adj.select(col("u").as("v"), col("nb").as("__nv")), "v")
      .select(col("u"), col("v").as("x"),
        explode(array_intersect(col("__nu"), col("__nv"))).as("y"))
    val out = tris
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
      .join(deg, "node")
      .select(col("node"), col("deg"), col("tri_cnt"))
      .localCheckpoint()
    e.unpersist(); oriented.unpersist(); deg.unpersist(); adj.unpersist()
    out
  }

  /** The direct triple-self-join oracle (affordable at oracle SFs; the
    * operator's orientation is the scale path). Needs `e(a, b)` —
    * canonical, distinct — in scope; yields (node, deg, tri_cnt). */
  val oracleSql: String =
    """t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      |                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
      |n AS (SELECT x AS node FROM t UNION ALL
      |      SELECT y FROM t UNION ALL
      |      SELECT z FROM t),
      |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |         SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      |       GROUP BY 1)
      |SELECT dg.node, dg.deg, CAST(count(*) AS BIGINT) AS tri_cnt
      |FROM n JOIN dg ON n.node = dg.node
      |GROUP BY 1, 2""".stripMargin
}
