package graft

/** Dev tool: dump `explain("formatted")` for every query and flag
  * scale-hostile plan shapes (cartesian products, missing pushed filters,
  * sort-merge joins where a broadcast was intended). Run:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.01"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.create(master = "local[8]", appName = "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // real shuffles = partitioning arguments of shuffle Exchanges
      // (BroadcastExchange is data movement but not a repartition of the
      // big side; counted separately)
      val shuffles = "Arguments: (hash|range)partitioning".r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size / 2 // tree + detail
      val pushed = "PushedFilters: \\[\\w".r.findAllIn(plan).size
      // SortMergeJoin is a review prompt, not an error: wrong where a
      // broadcast was intended (dimension enrichment), correct for
      // large-large joins. Reviewed-and-expected cases carry their exact
      // node COUNT, so a new unintended SMJ appearing in an allowlisted
      // query (e.g. a broadcast regressing) still raises a flag.
      val expectedSmj = Map(
        // label-propagation rounds join the edge list to itself-sized
        // label frames — large-large by design, one SMJ per round pair
        "q_dedup_clusters" -> "label propagation (large-large per round)",
        // manifest = dupClusters + a broadcast join back to the corpus;
        // the SMJs are the wrapped label-propagation rounds
        "q_dedup_manifest" -> "wraps dupClusters label propagation",
        "q_dedup_keep_best" -> "wraps dupClusters label propagation",
        "q_multimodal_manifest" -> "wraps dupClusters label propagation",
        // bucketized range join: both sides fact-sized, co-partitioned on
        // (key, bucket) — large-large by design
        "q_interval_join" -> "bucketized range join (large-large)",
        // the target/raw vocabulary FULL OUTER join: both sides are
        // vocab-sized and Spark cannot broadcast a full-outer side; the
        // subtree plans twice (once feeding the probe join, once the
        // totals aggregate), hence count 2 for one logical join
        "q_importance_resample" -> "vocab full-outer (x2 plan reuse)")
      // formatted explain prints each node once as a "(N) SortMergeJoin"
      // heading — count headings, not substring occurrences
      val smjCount = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).size
      // clusters is iterative: SMJ count grows with convergence rounds
      // (up to ~2 per round, maxRounds = 10); interval join has exactly 1
      val expectedCounts = Map("q_dedup_clusters" -> 20, "q_dedup_manifest" -> 20,
        "q_dedup_keep_best" -> 20, "q_multimodal_manifest" -> 20,
        "q_interval_join" -> 1, "q_importance_resample" -> 2)
      val smjUnexpected = smjCount > expectedCounts.getOrElse(name, 0)
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        s"SortMergeJoin(x$smjCount)" -> smjUnexpected)
        .collect { case (f, true) => f }
      val note = expectedSmj.get(name)
        .filter(_ => smjCount > 0 && !smjUnexpected)
        .fold("")(r => s" [expected SMJ x$smjCount: $r]")
      println(s"== $name  shuffles=$shuffles bcast=$bcasts pushedFilterScans=$pushed " +
        s"${if (flags.nonEmpty) "FLAGS:" + flags.mkString(",") else "clean"}$note")
      if (sys.env.get("PLAN_AUDIT_FULL").contains("1")) println(plan)
    }
    spark.stop()
  }
}
