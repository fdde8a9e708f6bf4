package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contingency-table independence analysis — the chi-square cross-tab
  * (Pearson 1900), the standard "are these two categoricals related"
  * screen (segment × priority, language × source, cohort × outcome):
  * per cell, the observed count, the independence-expected count, and
  * the cell's chi-square contribution
  *
  *   expected_micro = row_total × col_total × 1e6  div  N
  *   dev_micro      = (obs × N − row_total × col_total)² × 1e6
  *                      div (row_total × col_total × N)
  *
  * — each ONE truncating integer division over exact integer products
  * (the cross-multiplied form: no float expected value is ever
  * subtracted), so every cell is engine-exact; the table's chi-square
  * statistic is the plain SUM of dev_micro (truncation bias < #cells
  * micro-units, documented as part of the contract). Consumers compare
  * against the critical value in micro-units.
  *
  * Scale posture: one grouped count of the fact (map-side combined,
  * cells-sized output), marginals re-aggregated from the CELLS (never a
  * second fact scan), one scalar crossJoin-broadcast; products are
  * widened to DECIMAL(38,0) before multiplying (ANSI — overflow fails
  * loud, never wraps), safe through ~1e12-row tables.
  */
object Contingency {

  /** Cross-tab of `df`'s `row_key` × `col_key` columns. Returns one row
    * per cell of the FULL marginal grid — zero-observation cells
    * included (they carry real chi-square mass: a structural zero in a
    * dependent table is evidence, and dropping them understates the
    * statistic — pinned by the perfect-dependence spec). */
  def chiSquare(df: DataFrame): DataFrame = {
    val obsNz = df.groupBy(col("row_key"), col("col_key"))
      .agg(count(lit(1)).as("observed"))
    val rt = obsNz.groupBy("row_key").agg(sum("observed").as("rt"))
    val ct = obsNz.groupBy("col_key").agg(sum("observed").as("ct"))
    val n = obsNz.agg(sum("observed").as("n"))
    // the cells-sized marginal grid: both sides are category-cardinality
    // frames, so the cross product broadcasts (BroadcastNestedLoop, not a
    // partitioned cartesian) and the grid meets the observed cells in a
    // broadcast hash join
    val obs = rt.crossJoin(broadcast(ct))
      .join(broadcast(obsNz), Seq("row_key", "col_key"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    obs.crossJoin(broadcast(n))
      .withColumn("__d", expr(
        "CAST(observed AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct"))
      .select(col("row_key"), col("col_key"), col("observed"),
        expr("CAST(CAST(rt AS DECIMAL(38,0)) * ct * 1000000 div" +
          " CAST(n AS DECIMAL(38,0)) AS BIGINT)").as("expected_micro"),
        expr("CAST(__d * __d * 1000000 div" +
          " (CAST(rt AS DECIMAL(38,0)) * ct * n) AS BIGINT)")
          .as("dev_micro"))
  }

  /** [[chiSquare]] oracle. Needs `src(row_key, col_key)` in scope. */
  val oracleSql: String =
    """obsnz AS (SELECT row_key, col_key, CAST(count(*) AS BIGINT) AS observed
      |  FROM src GROUP BY 1, 2),
      |rtot AS (SELECT row_key, CAST(sum(observed) AS BIGINT) AS rt
      |  FROM obsnz GROUP BY 1),
      |ctot AS (SELECT col_key, CAST(sum(observed) AS BIGINT) AS ct
      |  FROM obsnz GROUP BY 1),
      |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obsnz),
      |obs AS (SELECT rtot.row_key, ctot.col_key,
      |    CAST(coalesce(obsnz.observed, 0) AS BIGINT) AS observed, rt, ct
      |  FROM rtot CROSS JOIN ctot
      |  LEFT JOIN obsnz ON obsnz.row_key = rtot.row_key
      |                 AND obsnz.col_key = ctot.col_key)
      |SELECT obs.row_key, obs.col_key, obs.observed,
      |  CAST(CAST(rt AS HUGEINT) * ct * 1000000 // n AS BIGINT)
      |    AS expected_micro,
      |  CAST((CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
      |    * (CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
      |    * 1000000 // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT)
      |    AS dev_micro
      |FROM obs CROSS JOIN tot""".stripMargin
}
