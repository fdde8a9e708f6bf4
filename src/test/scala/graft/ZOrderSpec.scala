package graft

import org.apache.spark.sql.functions._

/** Z-order layout: kernel correctness against a bit-level model, and the
  * actual data-skipping win measured from per-file min/max envelopes —
  * the thing the layout exists to produce. */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def model(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits)
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    z
  }

  test("graft_zorder == bit-level model over a cell grid, via SQL and codegen") {
    graft.functions.GraftFunctions.register(spark)
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), expr("graft_zorder(x, y, 5)").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === model(x, y, 5), s"($x,$y)") }
    // the curve is a bijection on the grid
    assert(got.map(_._3).distinct.length === cells.length)
  }

  test("out-of-range cell ids fail loudly instead of aliasing") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Throwable] {
      Seq((70000L, 1L)).toDF("x", "y")
        .select(expr("graft_zorder(x, y, 16)")).collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("quantized"), messages)
  }

  test("z-order layout prunes files on BOTH dimensions; linear sort only on its own") {
    graft.functions.GraftFunctions.register(spark)
    val li = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    graft.sources.ZOrderLayout.writeClustered(li, "l_partkey", "l_suppkey",
      zDir, nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // per-file envelopes, as the parquet footer would carry them
    def envelopes(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("px0"), max("l_partkey").as("px1"),
          min("l_suppkey").as("py0"), max("l_suppkey").as("py1"))
        .select("px0", "px1", "py0", "py1")
        .as[(Long, Long, Long, Long)].collect()

    val (pLo, pHi, sLo, sHi) = li.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long, Long, Long)].head()
    // a ~15%-of-range box on the SECONDARY dimension (suppkey): the
    // partkey-sorted layout carries the full suppkey range in every file
    // and can skip nothing; the curve layout keeps suppkey envelopes
    // tight too
    val (qLo, qHi) = (sLo + (sHi - sLo) * 40 / 100, sLo + (sHi - sLo) * 55 / 100)
    def overlapping(env: Array[(Long, Long, Long, Long)]): Int =
      env.count { case (_, _, y0, y1) => y1 >= qLo && y0 <= qHi }

    val zEnv = envelopes(zDir)
    val linEnv = envelopes(linDir)
    assert(zEnv.length >= nFiles / 2, s"z layout produced ${zEnv.length} files")
    val (zHit, linHit) = (overlapping(zEnv), overlapping(linEnv))
    info(s"suppkey-box files scanned: z-order $zHit/${zEnv.length}, " +
      s"linear $linHit/${linEnv.length}")
    // linear-by-partkey cannot meaningfully prune a suppkey predicate
    // (near-total bound, not exact: one small file's suppkey envelope
    // missing the box under a regenerated corpus split is not a
    // regression — the z-vs-linear contrast below is the real assertion)
    assert(linHit * 10 >= linEnv.length * 9,
      s"linear layout pruned suppkey box too well: $linHit/${linEnv.length}")
    // the curve layout must skip at least half the files
    assert(zHit * 2 <= zEnv.length, s"z-order skipped too little: $zHit/${zEnv.length}")

    // and the curve layout still prunes SOMETHING on the primary
    // dimension (the dedicated linear sort is naturally tighter there;
    // the curve trades a bounded amount of x-tightness for the y-skipping
    // above — interleave order puts y on the higher bit positions, and
    // range-partition boundary sampling adds slop)
    val (bLo, bHi) = (pLo + (pHi - pLo) * 40 / 100, pLo + (pHi - pLo) * 55 / 100)
    def overlappingX(env: Array[(Long, Long, Long, Long)]): Int =
      env.count { case (x0, x1, _, _) => x1 >= bLo && x0 <= bHi }
    info(s"partkey-box files scanned: z-order ${overlappingX(zEnv)}/${zEnv.length}, " +
      s"linear ${overlappingX(linEnv)}/${linEnv.length}")
    assert(overlappingX(zEnv) * 4 <= zEnv.length * 3,
      s"curve layout lost all x-tightness: ${overlappingX(zEnv)}/${zEnv.length}")
  }
}
