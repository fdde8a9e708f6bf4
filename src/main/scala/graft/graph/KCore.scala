package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the degeneracy-based cohesion filter (Seidman 1983,
  * "Network structure and minimum degree"): repeatedly remove nodes of
  * degree < k until only the k-core survives. The standard dense-region
  * extractor — spam rings, community cores, the "only well-connected
  * entities" gate a co-purchase or interaction graph gets before
  * expensive downstream analytics.
  *
  * Contract: EXACTLY `rounds` peels (the [[PageRank]] fixed-pass
  * discipline) — each round computes degrees over the surviving edge
  * set and drops every endpoint below k. The result after R rounds is
  * deterministic at ANY scale whether or not the peel has converged, so
  * the chained-CTE oracle replays it bit-for-bit; callers needing the
  * true fixpoint pass `requireConverged = true` and the operator
  * fail-louds if round R still removed an edge (the [[ graft.dedup.Dedup.dupClusters]]
  * convergence-assert discipline). Returns (node, deg) over the
  * surviving edges — pure integer counting, engine-exact.
  *
  * Scale posture: per round, one degree aggregation (map-side combined)
  * and two node-sized semi-joins to drop dead endpoints; the edge frame
  * is `localCheckpoint`ed every round so plans stay bounded (the
  * round-10 iterative-loop discipline). Rounds are a plan constant;
  * real corpora converge in a handful of peels because each round
  * removes whole frontier layers.
  */
object KCore {

  /** Peel `edges` (canonical a < b, distinct) for exactly `rounds`
    * rounds at threshold `k`. */
  def survivors(edges: DataFrame, k: Long, rounds: Int,
      requireConverged: Boolean = false): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(rounds >= 1 && rounds <= 16, s"rounds $rounds out of [1, 16]")
    // r14: checkpoints are LAZY (eager = false) — the logical plan is
    // truncated to a LogicalRDD immediately (each round's plan stays two
    // joins + one agg, the same bound as before), but materialization is
    // deferred to the caller's single action instead of paying one
    // blocking job + one full edge-list block write per round. Each
    // round's RDD still persists on first compute, so the agg and both
    // semi-join probes of round r+1 read round r's stored blocks, not
    // its lineage. The convergence path still forces per-round actions
    // through its own count()s.
    var e = edges.select(col("a"), col("b")).localCheckpoint(eager = false)
    for (r <- 1 to rounds) {
      val alive = e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      // convergence needs edge counts only around the FINAL peel (round
      // R removed 0 edges <=> fixpoint) — earlier rounds run count-free,
      // and the default fixed-pass mode launches no count jobs at all
      val checkHere = requireConverged && r == rounds
      val before = if (checkHere) e.count() else -1L
      e = e
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(eager = false)
      if (checkHere) {
        val lastRemoved = before - e.count()
        require(lastRemoved == 0L,
          s"k-core peel did not converge in $rounds rounds " +
            s"(last round still removed $lastRemoved edges) — raise rounds")
      }
    }
    e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Chained-CTE oracle: the same R peels. Needs `e(a, b)` in scope;
    * yields (node, deg) over the surviving edges. */
  def oracleSql(k: Long, rounds: Int): String = {
    val cte = (1 to rounds).map { r =>
      val prev = if (r == 1) "e" else s"e${r - 1}"
      s"""a$r AS MATERIALIZED (SELECT node FROM (
         |    SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |      SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
         |    GROUP BY 1) WHERE deg >= $k),
         |e$r AS MATERIALIZED (SELECT a, b FROM $prev
         |  WHERE a IN (SELECT node FROM a$r)
         |    AND b IN (SELECT node FROM a$r))""".stripMargin
    }.mkString(",\n")
    s"""$cte
       |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |  SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY 1""".stripMargin
  }
}
