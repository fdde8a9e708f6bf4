package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT any sort — the scale-safe
  * way to get exact quantile cut values out of a frame whose value
  * cardinality is as large as the frame itself (where the distinct-value
  * histogram trick of [[Features.winsorize]] stops helping: a histogram
  * over an all-distinct column IS the column, and its cumulative window
  * is a single-task sort again — measured at a 10M-account dimension the
  * histogram-cut RFM ran 28.2 s vs 17.3 s for even the naive global
  * windows, see SCALING.md round-9).
  *
  * Method: iterative range-narrowing (the classic distributed selection
  * algorithm). Each iteration buckets the group's live value range into
  * `buckets` equal integer-width cells with ONE map-side-combined
  * aggregation (no shuffle wider than groups × buckets), pulls the tiny
  * bucket-count table to the driver, locates the bucket containing each
  * target rank, and narrows the range to it. Integer widths shrink the
  * span by ×`buckets` per pass, so longs resolve in at most
  * ceil(log_1024 2^64) = 7 passes — and realistic ranges in 2-3. All
  * driver-side state is (group × rank) sized; nothing ever sorts,
  * nothing single-tasks, every pass is an embarrassingly-parallel scan.
  */
object OrderStatistics {

  /** Exact k-th smallest value (1-based rank, duplicates counted) per
    * group, for several ranks at once.
    *
    * @param values frame with `groupCol` (string) and `valueCol` (long)
    * @param ranks  per group, the ascending-rank targets (each must be in
    *               [1, group row count] — checked, fail-loud)
    * @return (group, rank) -> value. Exact: the value v with
    *         cnt(< v) < rank <= cnt(<= v).
    */
  def kthSmallest(values: DataFrame, groupCol: String, valueCol: String,
      ranks: Map[String, Seq[Long]], buckets: Int = 1024,
      maxIters: Int = 8): Map[(String, Long), Long] = {
    require(buckets >= 2, "need at least 2 buckets per pass")
    val spark = values.sparkSession
    import spark.implicits._

    val vf = values.select(col(groupCol).as("__g"), col(valueCol).as("__v"))

    // one aggregation bootstraps every group's range and count
    val bounds = vf.groupBy("__g")
      .agg(min("__v").as("lo"), max("__v").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

    // live targets: (group, rank, lo, hi, countBelowLo). Ranks MUST be
    // deduplicated: a repeated (g, r) would put two identical rows into
    // the broadcast target frame, the per-bucket groupBy on
    // (__tg, __tr, __b) would merge them with DOUBLED counts, and
    // `acc + c >= r` would then locate rank r at ~rank ceil(r/2) —
    // e.g. colliding p90/p99 ranks in a <=9-row group would silently
    // resolve to a lower order statistic. The resolved map is keyed by
    // (group, rank), so dedup is invisible to callers.
    var live = ranks.toSeq.flatMap { case (g, rs) =>
      val (lo, hi, n) = bounds.getOrElse(g,
        throw new IllegalArgumentException(s"group '$g' absent from frame"))
      rs.distinct.map { r =>
        require(r >= 1 && r <= n, s"rank $r out of [1, $n] for group '$g'")
        (g, r, lo, hi, 0L)
      }
    }
    val resolved = scala.collection.mutable.Map.empty[(String, Long), Long]
    // span math in BigInt: a hash-valued column legitimately spans nearly
    // the whole long domain, where hi - lo + 1 wraps. The WIDTH always
    // fits a long (ceil(2^64 / buckets) < 2^55 at buckets >= 1024).
    def width(lo: Long, hi: Long): Long = {
      val span = BigInt(hi) - BigInt(lo) + 1
      ((span + buckets - 1) / buckets).toLong
    }
    live.filter(t => t._3 == t._4).foreach(t => resolved((t._1, t._2)) = t._3)
    live = live.filterNot(t => t._3 == t._4)

    var iter = 0
    while (live.nonEmpty) {
      require(iter < maxIters,
        s"selection did not converge in $maxIters passes (${live.size} live)")
      iter += 1
      val tgt = live.map { case (g, r, lo, hi, _) => (g, r, lo, hi, width(lo, hi)) }
        .toDF("__tg", "__tr", "__lo", "__hi", "__w")
      // counts per (target, bucket): groups × buckets rows, map-side combined
      val cnts = vf.join(broadcast(tgt),
          col("__g") === col("__tg") &&
            col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        // (__v - __lo) must not wrap on full-domain ranges: difference in
        // DECIMAL(21,0), integral-divided (div on decimals is exact and
        // returns BIGINT) — the bucket index is < `buckets`, long-safe
        .groupBy(col("__tg"), col("__tr"),
          expr("(CAST(__v AS DECIMAL(21,0)) - CAST(__lo AS DECIMAL(21,0)))" +
            " div CAST(__w AS DECIMAL(21,0))").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect()
        .groupBy(r => (r.getString(0), r.getLong(1)))
        .map { case (k, rows) =>
          k -> rows.map(r => r.getLong(2) -> r.getLong(3)).sortBy(_._1)
        }
      live = live.flatMap { case (g, r, lo, hi, base) =>
        val w = width(lo, hi)
        var acc = base
        val row = cnts.getOrElse((g, r),
          throw new IllegalStateException(s"no counts for ($g, $r)"))
        val (bStar, accBefore) = {
          var found = -1L; var before = 0L
          row.foreach { case (b, c) =>
            if (found < 0) { if (acc + c >= r) { found = b; before = acc } else acc += c }
          }
          require(found >= 0, s"rank $r not reachable in [$lo, $hi] for '$g'")
          (found, before)
        }
        // nLo/nHi are inside [lo, hi] mathematically; compute in BigInt
        // so the intermediate product cannot wrap
        val nLo = (BigInt(lo) + BigInt(bStar) * BigInt(w)).toLong
        val nHi = if (BigInt(nLo) + BigInt(w) - 1 > BigInt(hi)) hi
          else nLo + w - 1
        if (w == 1 || nLo == nHi) { resolved((g, r)) = nLo; None }
        else Some((g, r, nLo, nHi, accBefore))
      }
    }
    resolved.toMap
  }
}
