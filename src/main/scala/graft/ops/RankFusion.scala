package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to combine heterogeneous
  * rankings of the same key space (Cormack, Clarke & Büttcher, SIGIR
  * 2009: RRF "outperforms Condorcet and individual rank learning
  * methods"), used here the way a retrieval pipeline fuses ANN tiers,
  * BM25 lists, or business metrics that disagree on scale:
  *
  *   rrf(key) = Σ_lists  1e6 div (k + rank_list(key))
  *
  * in INTEGER micro-units (truncating division), so fusion is exact —
  * no float weighting, no cross-engine drift; k = 60 is the paper's
  * constant. Each input list ranks by (score DESC, key ASC) — a strict
  * total order, so ranks are engine-deterministic even on score ties.
  *
  * Scale posture: inputs are RANKED LISTS (top-k retrieval outputs or
  * dimension-sized scoreboards), not fact tables — the unpartitioned
  * rank window is over a frame that by contract fits one partition
  * (the same posture as the scoreboard windows elsewhere; fact-scale
  * scoring belongs upstream in the list producers). The fusion itself
  * is one union + one map-side-combined aggregation, fully parallel.
  */
object RankFusion {

  private val Micro = 1000000L

  /** Fuse score lists (each with columns `key`, `score`) into
    * (key, n_lists, rrf_micro). Keys absent from a list simply earn
    * nothing from it. */
  def fuse(lists: Seq[DataFrame], k: Long = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1, s"rrf constant k=$k must be >= 1")
    val ranked = lists.map { df =>
      df.select(col("key"), col("score"))
        .withColumn("__rank", row_number().over(
          Window.orderBy(col("score").desc, col("key"))))
        .select(col("key"), col("__rank"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("key")
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"${Micro}L div (${k}L + __rank)")).as("rrf_micro"))
      .select(col("key"), col("n_lists"), col("rrf_micro"))
  }

  /** Oracle fragment: ranks `lN(key, score)` CTEs and fuses them with
    * the same integer formula. Pass the list CTE names. */
  def oracleSql(listCtes: Seq[String], k: Long = 60): String = {
    val ranked = listCtes.map(n =>
      s"""SELECT key, CAST(row_number() OVER (ORDER BY score DESC, key) AS BIGINT) AS r
         |FROM $n""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""rk AS (
       |$ranked
       |)
       |SELECT key, CAST(count(*) AS BIGINT) AS n_lists,
       |  CAST(sum($Micro // ($k + r)) AS BIGINT) AS rrf_micro
       |FROM rk GROUP BY 1""".stripMargin
  }
}
