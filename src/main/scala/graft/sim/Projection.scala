package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a DETERMINISTIC ±1
  * matrix (Achlioptas 2003: Rademacher entries preserve pairwise
  * distances with the same JL guarantee as Gaussians, and admit
  * integer arithmetic). The matrix is not stored anywhere: entry
  * R(j, i) is the parity of `xxhash64(j·dIn + i)` — any executor, any
  * engine, any rerun derives the identical matrix, which is what makes
  * the whole operator oracle-replayable and makes the projection of a
  * 100 TB embedding table embarrassingly parallel (a per-row map with a
  * plan-constant matrix; no shuffle, no broadcast of learned state,
  * nothing to version).
  *
  * Inputs are global-grid integer-quantized first (the [[Gram]]
  * discipline), so every projected coordinate is an exact integer sum
  * of ±g_i — engine-exact, order-independent. Dimension folding runs as
  * builtin `transform`/`zip_with`/`aggregate` HOFs inside codegen.
  */
object Projection {

  /** The ±1 matrix row-major: R(j)(i) = 1 − 2·parity(xxh64(j·dIn+i)).
    * Spark's own XXH64 (seed 42 — the `xxhash64` builtin's default), so
    * the SQL replay is the already-proven `SqlHash.xxh64LongSteps`. */
  def signMatrix(dIn: Int, dOut: Int): Seq[Seq[Long]] =
    (0 until dOut).map { j =>
      (0 until dIn).map { i =>
        val h = XXH64.hashLong(j.toLong * dIn + i, 42L)
        1L - 2L * (((h % 2) + 2) % 2)
      }
    }

  /** Project the embedding table to `dOut` dimensions:
    * (vec_id, j, v) with v = Σ_i R(j,i)·g_i exact — `dIn·dOut`
    * integer multiply-adds per row, one scan, zero shuffles. */
  def jlProject(embeddings: DataFrame, dIn: Int, dOut: Int,
      grid: Int = 1024): DataFrame = {
    val r = embeddings.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val mn = r.getDouble(0)
    val mx = r.getDouble(1)
    val st = (mx - mn) / grid
    require(st > 0, s"degenerate embedding range [$mn, $mx]")
    val rLit = typedlit(signMatrix(dIn, dOut))
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          least(floor((x.cast("double") - lit(mn)) / lit(st)).cast("long"),
            lit((grid - 1).toLong))).as("g"))
      .select(col("vec_id"),
        posexplode(transform(rLit, row =>
          aggregate(zip_with(row, col("g"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))).as(Seq("j", "v")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("v"))
  }
}
