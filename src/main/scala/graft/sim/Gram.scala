package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Second-moment (Gram) matrix accumulation over embedding tables — the
  * distributed statistic behind whitening / PCA / OPQ rotation training
  * (Jégou et al. PQ, Ge et al. OPQ: the rotation is trained from
  * exactly this matrix; whitening needs Gram + mean). At 100 TB the
  * only viable shape is a MAP-SIDE COMBINED aggregate whose partial
  * state is the d×d accumulator itself: each partition's whole stream
  * collapses into one `d(d+1)/2`-long buffer before the exchange, so
  * the shuffle moves `O(partitions × d²/2)` longs — never a row. (A
  * `posexplode → groupBy(i, j)` formulation would write `n × d(d+1)/2`
  * shuffle rows — a four-thousand-fold write amplification at d=64.)
  *
  * Values are INTEGER-GRID QUANTIZED before accumulation (global
  * min/max scalar → equal-width grid, the `graft_zorder`/PQ unit-grid
  * discipline): products and sums are exact longs, immune to
  * float-summation order, so the result is engine-exact and the DuckDB
  * oracle replays it bit-for-bit — the same reason
  * [[Similarity.labelCentroids]] emits integer sums. Grid resolution
  * error is the standard quantized-moment trade (1024 steps ≈ 1e-3 of
  * the value range per axis), the exact regime PQ/OPQ training already
  * operates in.
  */
object Gram {

  /** Flattened upper-triangle Gram accumulator: for input vector g,
    * buffer[k(i,j)] += g(i)·g(j) for i ≤ j, row-major triangle order.
    * Associative + commutative (integer adds), so partial aggregation
    * is exact under any partition layout or merge order. */
  object GramAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf0: Array[Long], x: Array[Long]): Array[Long] = {
      val d = x.length
      val need = d * (d + 1) / 2
      val buf = if (buf0.isEmpty) new Array[Long](need) else buf0
      require(buf.length == need,
        s"GramAgg: ragged vector (dims $d vs buffer ${buf.length})")
      var k = 0
      var i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { buf(k) += xi * x(j); j += 1; k += 1 }
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        require(x.length == y.length,
          s"GramAgg: mismatched buffers (${x.length} vs ${y.length})")
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExprEnc
    override def outputEncoder: Encoder[Array[Long]] = ExprEnc
    private lazy val ExprEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Integer-grid quantization column: global `[mn, mx]` → `grid`
    * equal-width steps, `g_i = min(floor((x_i - mn)/step), grid-1)`.
    * `mn`/`mx` enter the plan as double literals (plan-constant scalar,
    * one tiny pre-pass); every op is a fixed-order IEEE expression the
    * oracle evaluates identically. */
  private def quantized(mn: Double, st: Double, grid: Int): Column =
    transform(col("embedding"), x =>
      least(floor((x.cast("double") - lit(mn)) / lit(st)).cast("long"),
        lit((grid - 1).toLong)))

  /** The upper-triangle Gram matrix of the quantized embedding table:
    * (i, j, gram_sum, n_rows) for 0 ≤ i ≤ j < dims — `d(d+1)/2` rows,
    * model-sized. One scalar pre-pass (global min/max) + ONE
    * map-side-combined aggregation pass over the corpus. */
  def gramUpperTriangle(embeddings: DataFrame, dims: Int,
      grid: Int = 1024): DataFrame = {
    val r = embeddings.agg(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    val mn = r.getDouble(0)
    val mx = r.getDouble(1)
    val st = (mx - mn) / grid
    require(st > 0, s"degenerate embedding range [$mn, $mx]")
    val gramUdaf = udaf(GramAgg)
    val pairIdx = expr(
      s"""flatten(transform(sequence(0, ${dims - 1}, 1), i ->
         |  transform(sequence(i, ${dims - 1}, 1), j ->
         |    struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j))))""".stripMargin)
    embeddings
      .select(quantized(mn, st, grid).as("g"))
      .agg(gramUdaf(col("g")).as("gram"), count(lit(1)).as("n_rows"))
      .select(col("n_rows"), col("gram"), pairIdx.as("ij"))
      .select(col("n_rows"), explode(arrays_zip(col("ij"), col("gram"))).as("z"))
      .select(col("z.ij.i").as("i"), col("z.ij.j").as("j"),
        col("z.gram").as("gram_sum"), col("n_rows"))
  }
}
