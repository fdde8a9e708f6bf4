package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank with fully INTEGER rank arithmetic — the graph
  * centrality operator (Brin & Page 1998) over edges expressed as a plain
  * (src, dst) frame. Complements the connected-components family
  * ([[graft.dedup.Dedup.dupClusters]]): components answer "which nodes
  * belong together", PageRank answers "which node in the neighborhood is
  * the one that matters" — representative selection over co-purchase /
  * citation / near-dup graphs.
  *
  * Exactness: float PageRank has no cross-engine bit identity (per-node
  * sums are order-dependent), so every quantity here is a scaled LONG:
  * ranks carry SCALE = 1e12, each iteration is
  *
  *   r'(v) = base + (d_micro × Σ_{u→v} (r(u) div outdeg(u))) div 1e6,
  *   base  = ((SCALE div N) × (1e6 − d_micro)) div 1e6
  *
  * — truncating integer division at every step, so aggregation order
  * cannot change a single bit and the DuckDB oracle replays all K
  * iterations as chained CTEs (the [[graft.text.BpeTrain]] replay
  * pattern). The deliberate rounding leak (≤ outdeg µ-units per node per
  * pass) is part of the contract, not noise. No overflow: total rank mass
  * ≤ SCALE = 1e12 and d_micro × incoming ≤ 8.5e17 < 2^63.
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

  /** PageRank over directed `edges` (cols `src`, `dst`, string node ids;
    * parallel edges count once — dedup upstream if needed). Returns
    * (node, rank_scaled) after exactly `iters` passes. */
  def ranks(edges: DataFrame, iters: Int = 4,
      dampingMicro: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters $iters out of [1, 16]")
    require(dampingMicro >= 0 && dampingMicro <= MicroOne,
      s"dampingMicro $dampingMicro out of [0, 1e6]")
    val e = edges.select(col("src"), col("dst")).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    // every src and every dst is a node (symmetric graphs: src suffices,
    // but directed sinks must exist too)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val nn = nodes.count()
    require(nn > 0, "empty graph")
    val r0 = Scale / nn // div: both positive
    val base = ((Scale / nn) * (MicroOne - dampingMicro)) / MicroOne

    var ranks = nodes.withColumn("r", lit(r0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("inc"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$dampingMicro * coalesce(inc, 0L) div ${MicroOne}"))
            .as("r"))
        .localCheckpoint()
    }
    val out = ranks.select(col("node"), col("r").as("rank_scaled"))
    e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    out
  }

  /** The chained-CTE DuckDB replay of [[ranks]] for K iterations, given a
    * CTE named `e(src, dst)` already in scope — kept HERE so the operator
    * and its oracle share one formula (change together or not at all). */
  def oracleSql(iters: Int = 4, dampingMicro: Long = 850000L): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (SELECT nodes.node,
         |    bs.base + $dampingMicro * coalesce(inc.s, 0) // $MicroOne AS r
         |  FROM nodes CROSS JOIN bs LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r${k - 1}.r // od.deg) AS BIGINT) AS s
         |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |           JOIN od ON e.src = od.src
         |    GROUP BY 1) inc ON nodes.node = inc.node)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |od AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |bs AS (SELECT ($Scale // n) * (${MicroOne} - $dampingMicro) // ${MicroOne} AS base,
       |              $Scale // n AS r0 FROM nn),
       |r0 AS (SELECT node, r0 AS r FROM nodes CROSS JOIN bs),
       |$rounds""".stripMargin
  }
}
