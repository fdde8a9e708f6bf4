package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank with fully INTEGER rank arithmetic — the graph
  * centrality operator (Brin & Page 1998) over edges expressed as a plain
  * (src, dst) frame, plus its seeded variant TrustRank (Gyöngyi, Garcia-
  * Molina & Pedersen, VLDB 2004): teleport mass restricted to a trusted
  * seed set, the standard quality/spam-propagation method — seed a few
  * vetted nodes, let trust flow along edges, gate on the propagated
  * score. Complements the connected-components family
  * ([[graft.dedup.Dedup.dupClusters]]): components answer "which nodes
  * belong together", PageRank "which node matters", TrustRank "which
  * node does a TRUSTED region vouch for".
  *
  * Exactness: float PageRank has no cross-engine bit identity (per-node
  * sums are order-dependent), so every quantity here is a scaled LONG:
  * ranks carry SCALE = 1e12, each iteration is
  *
  *   r'(v) = base(v) + (d_micro × Σ_{u→v} (r(u) div outdeg(u))) div 1e6
  *
  * — `base(v)` is the node's teleport mass (uniform for PageRank, seeds-
  * only for TrustRank), with truncating integer division at every step,
  * so aggregation order cannot change a single bit and the DuckDB oracle
  * replays all K iterations as chained CTEs (the [[graft.text.BpeTrain]]
  * replay pattern). The deliberate rounding leak (≤ outdeg µ-units per
  * node per pass) is part of the contract, not noise. No overflow: total
  * rank mass ≤ SCALE = 1e12 and d_micro × incoming ≤ 8.5e17 < 2^63.
  *
  * Scale posture: per iteration, ranks (node-sized) join edges on src —
  * a co-partitioned shuffle on the edge key — and aggregate per dst with
  * map-side combine; edges and out-degrees are computed once and
  * persisted; the rank frame is `localCheckpoint`ed every round (the
  * round-10 iterative-loop discipline — plans stay bounded, lineage
  * never re-embeds prior rounds). Dangling nodes (outdeg 0) keep their
  * base mass; symmetrized graphs have none.
  */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12: integer rank mass
  val MicroOne: Long = 1000000L

  private def checkParams(iters: Int, dampingMicro: Long): Unit = {
    require(iters >= 1 && iters <= 16, s"iters $iters out of [1, 16]")
    require(dampingMicro >= 0 && dampingMicro <= MicroOne,
      s"dampingMicro $dampingMicro out of [0, 1e6]")
  }

  /** The shared iteration over a prepared node frame carrying per-node
    * (base, r0) teleport columns.
    *
    * r14 (optimization guide §2.4): the out-degree join is loop-INVARIANT
    * — it is attached to the edge list ONCE, outside the pass loop, and
    * the (src, dst, deg) frame is hash-repartitioned on `src` BEFORE
    * persisting, so every pass's ranks⋈edges join reuses the cached
    * partitioning (the edge side never re-exchanges; only the node-sized
    * rank frame shuffles per pass). Previously each pass paid an
    * edge-sized exchange for the join plus a second one for the
    * per-pass outdeg join: 2 edge shuffles × iters → 1 total. */
  private def iterate(edges: DataFrame, nodesB: DataFrame, iters: Int,
      dampingMicro: Long): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val ed = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .persist()
    val nb = nodesB.persist()
    var ranks = nb.select(col("node"), col("r0").as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inc"))
      ranks = nb
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (col("base") + expr(s"$dampingMicro * coalesce(inc, 0L) div ${MicroOne}"))
            .as("r"))
        .localCheckpoint()
    }
    val out = ranks.select(col("node"), col("r").as("rank_scaled"))
    ed.unpersist(); nb.unpersist()
    out
  }

  /** Every src and every dst is a node (symmetric graphs: src suffices,
    * but directed sinks must exist too — callers that KNOW the edge set
    * is symmetrized pass `symmetric = true` to halve the distinct's
    * input; identical node set by definition there). */
  private def nodeSet(edges: DataFrame, symmetric: Boolean): DataFrame =
    if (symmetric) edges.select(col("src").as("node")).distinct()
    else edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

  /** PageRank over directed `edges` (cols `src`, `dst`, string node ids;
    * parallel edges count once — dedup upstream if needed). Returns
    * (node, rank_scaled) after exactly `iters` passes. */
  def ranks(edges: DataFrame, iters: Int = 4,
      dampingMicro: Long = 850000L, symmetric: Boolean = false): DataFrame = {
    checkParams(iters, dampingMicro)
    // the edge frame feeds the node set, the degree agg AND the join
    // side of iterate's one-time (src, dst, deg) build — persist so the
    // caller's derivation (often a join+distinct) runs once, not 4-6×
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = nodeSet(e, symmetric)
    val nn = nodes.count()
    require(nn > 0, "empty graph")
    val r0 = Scale / nn // div: both positive
    val base = ((Scale / nn) * (MicroOne - dampingMicro)) / MicroOne
    val out = iterate(e,
      nodes.withColumn("base", lit(base)).withColumn("r0", lit(r0)),
      iters, dampingMicro)
    // iterate's eager per-pass checkpoints have already materialized
    // everything that reads e by the time it returns
    e.unpersist()
    out
  }

  /** TrustRank: identical iteration, but ALL teleport mass (initial rank
    * and per-pass base) goes to `seeds` (a frame with a `node` column;
    * intersected with the graph's nodes — absent seeds are ignored,
    * fail-loud if none remain). Non-seed nodes earn rank only through
    * in-edges from the trusted region. */
  def trustRanks(edges: DataFrame, seeds: DataFrame, iters: Int = 4,
      dampingMicro: Long = 850000L, symmetric: Boolean = false): DataFrame = {
    checkParams(iters, dampingMicro)
    // same single-pass edge persist as [[ranks]]
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = nodeSet(e, symmetric)
    val sd = nodes.join(seeds.select("node").distinct(), "node").persist()
    val ns = sd.count()
    require(ns > 0, "no seed is a node of the graph")
    val r0 = Scale / ns
    val base = ((Scale / ns) * (MicroOne - dampingMicro)) / MicroOne
    val nodesB = nodes
      .join(sd.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit(base)).otherwise(lit(0L)).as("base"),
        when(col("__s").isNotNull, lit(r0)).otherwise(lit(0L)).as("r0"))
    val out = iterate(e, nodesB, iters, dampingMicro)
    sd.unpersist(); e.unpersist()
    out
  }

  /** The chained-CTE rounds shared by both oracles, iterating over a
    * caller-provided CTE `b(node, base, r0)` — kept HERE so operator and
    * oracle share one formula (change together or not at all). Needs
    * `e(src, dst)` and `b` in scope.
    *
    * Every CTE is `MATERIALIZED`: DuckDB (the replay engine) inlines
    * plain CTEs, so without the hint round k's tree re-embeds b (and,
    * through it, the whole edge derivation) once per round — the r13
    * sf1 replay spilled ~50 GB and paced ~35 min/query from exactly
    * this. Materialized per-round temp results replay sf1 in ~20 s.
    * Callers must mark their `e` and `b` inputs MATERIALIZED too. */
  def oracleRounds(iters: Int, dampingMicro: Long): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT b.node,
         |    b.base + $dampingMicro * coalesce(inc.s, 0) // $MicroOne AS r
         |  FROM b LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r${k - 1}.r // od.deg) AS BIGINT) AS s
         |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |           JOIN od ON e.src = od.src
         |    GROUP BY 1) inc ON b.node = inc.node)""".stripMargin
    }.mkString(",\n")
    s"""od AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT node, r0 AS r FROM b),
       |$rounds""".stripMargin
  }

  /** Uniform-teleport oracle: builds `b` from the node set, then the
    * shared rounds. Needs `e(src, dst)` in scope. */
  def oracleSql(iters: Int = 4, dampingMicro: Long = 850000L): String =
    s"""nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |b AS MATERIALIZED (SELECT node,
       |    ($Scale // n) * (${MicroOne} - $dampingMicro) // ${MicroOne} AS base,
       |    $Scale // n AS r0 FROM nodes CROSS JOIN nn),
       |${oracleRounds(iters, dampingMicro)}""".stripMargin

  /** Seeded-teleport oracle: `b` gives all mass to seeds. Needs
    * `e(src, dst)` and `seeds(node)` in scope. */
  def oracleSqlTrust(iters: Int = 4, dampingMicro: Long = 850000L): String =
    s"""nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |sd AS MATERIALIZED (
       |  SELECT DISTINCT nodes.node FROM nodes JOIN seeds USING (node)),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sd),
       |b AS MATERIALIZED (SELECT nodes.node,
       |    CASE WHEN sd.node IS NOT NULL
       |      THEN ($Scale // n) * (${MicroOne} - $dampingMicro) // ${MicroOne}
       |      ELSE 0 END AS base,
       |    CASE WHEN sd.node IS NOT NULL THEN $Scale // n ELSE 0 END AS r0
       |  FROM nodes CROSS JOIN ns LEFT JOIN sd ON nodes.node = sd.node),
       |${oracleRounds(iters, dampingMicro)}""".stripMargin
}
