package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford first-digit conformance test — the classic forensic
  * data-quality screen (Benford 1938; Nigrini's fraud-audit
  * formulation): naturally-occurring multiplicative quantities have
  * first significant digit d with probability log10(1 + 1/d), and
  * fabricated or truncated data reliably misses that curve. Run over
  * amounts, balances, populations — anything spanning magnitudes.
  *
  * Exactness: the nine expected proportions are IRRATIONAL, so they
  * enter as micro-scaled INTEGER literals (floor(log10(1+1/d) × 1e6) —
  * frozen here, identical in operator and oracle by construction), and
  * each digit's chi-square contribution is the cross-multiplied
  *
  *   dev_micro = (obs × 1e6 − exp_micro × N)²  div  (exp_micro × N × 1e6)
  *
  * — one truncating division over DECIMAL(38,0)/HUGEINT-widened exact
  * integer products (the [[Contingency]] discipline). All nine digits
  * are emitted even at zero observations (a missing digit is the
  * loudest possible signal).
  *
  * Scale posture: one scan projecting the first significant digit, one
  * map-side-combined 9-group count, a 9-row broadcast grid — nothing
  * else.
  */
object Benford {

  /** floor(log10(1 + 1/d) × 1e6) for d = 1..9 — the frozen contract. */
  val ExpectedMicro: Seq[Long] = Seq(
    301029L, 176091L, 124938L, 96910L, 79181L,
    66946L, 57991L, 51152L, 45757L)

  /** First-digit conformance of `value` (a positive integer column —
    * scale money to cents upstream; zero/negative rows are excluded as
    * having no first significant digit). Returns one row per digit:
    * (digit, observed, expected_micro, dev_micro). */
  def firstDigit(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.select(value.as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val grid = ExpectedMicro.zipWithIndex
      .map { case (e, i) => (i + 1L, e) }.toDF("digit", "expected_micro")
    val n = obs.agg(sum(col("observed")).as("n"))
    grid
      .join(broadcast(obs), Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("__d", expr(
        "CAST(observed AS DECIMAL(38,0)) * 1000000 -" +
          " CAST(expected_micro AS DECIMAL(38,0)) * n"))
      .select(col("digit"), col("observed"), col("expected_micro"),
        expr("CAST(__d * __d div (CAST(expected_micro AS DECIMAL(38,0))" +
          " * n * 1000000) AS BIGINT)").as("dev_micro"))
  }

  /** [[firstDigit]] oracle. Needs `src(v)` (positive BIGINT) in scope. */
  val oracleSql: String = {
    val grid = ExpectedMicro.zipWithIndex
      .map { case (e, i) => s"(${i + 1}, ${e}::BIGINT)" }.mkString(", ")
    s"""obs AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
       |    AS digit, CAST(count(*) AS BIGINT) AS observed
       |  FROM src WHERE v > 0 GROUP BY 1),
       |grid AS (SELECT * FROM (VALUES $grid) g(digit, expected_micro)),
       |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
       |SELECT CAST(grid.digit AS BIGINT) AS digit,
       |  CAST(coalesce(obs.observed, 0) AS BIGINT) AS observed,
       |  grid.expected_micro,
       |  CAST((CAST(coalesce(obs.observed, 0) AS HUGEINT) * 1000000
       |        - CAST(grid.expected_micro AS HUGEINT) * n)
       |     * (CAST(coalesce(obs.observed, 0) AS HUGEINT) * 1000000
       |        - CAST(grid.expected_micro AS HUGEINT) * n)
       |    // (CAST(grid.expected_micro AS HUGEINT) * n * 1000000)
       |    AS BIGINT) AS dev_micro
       |FROM grid LEFT JOIN obs ON grid.digit = obs.digit
       |CROSS JOIN tot""".stripMargin
  }
}
