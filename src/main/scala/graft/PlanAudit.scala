package graft

/** Dev tool: dump `explain("formatted")` for every query and flag
  * scale-hostile plan shapes (cartesian products, missing pushed filters,
  * sort-merge joins where a broadcast was intended). Run:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.01"`; an optional
  * second arg is a comma-separated query-name subset. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = GraftSession.create(master = "local[8]", appName = "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
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
        // NOTE: the dupClusters manifest family no longer appears here —
        // each label-propagation round is localCheckpoint-truncated, so
        // the emitted plans are bounded (leaves = checkpoint RDDs,
        // r10: 441 BroadcastExchange nodes -> 2, 27 shuffles -> 4) and
        // SMJ-free; the per-round join work runs at construction.
        // bucketized range join: both sides fact-sized, co-partitioned on
        // (key, bucket) — large-large by design
        "q_interval_join" -> "bucketized range join (large-large)",
        // the target/raw vocabulary FULL OUTER join: both sides are
        // vocab-sized and Spark cannot broadcast a full-outer side; the
        // subtree plans twice (once feeding the probe join, once the
        // totals aggregate), hence count 2 for one logical join
        "q_importance_resample" -> "vocab full-outer (x2 plan reuse)",
        // the two LeftSemi joins pruning the text scan to candidate-
        // touched doc_ids: the id list is candidate-sized (unbounded at a
        // 100 TB batch), so the static plan keeps the scale-safe SMJ and
        // AQE converts to broadcast at runtime whenever the batch is small
        "q_dedup_incremental" -> "touched-id semi-join text pruning (x2: corpus+batch union sides)",
        // the two endpoint->label lookup joins: the label table is
        // corpus-sized (one (long,long) row per pair-touched doc), the
        // batch side small — but labels cannot broadcast at 100 TB, so
        // the static plan keeps the scalar-id SMJ; AQE broadcasts at
        // runtime for small corpora
        "q_dedup_clusters_incremental" -> "endpoint label-lookup id joins (x2: doc_a+doc_b sides)",
        // RRF fuses the BM25 and QL top-k lists with a FULL OUTER join
        // (a doc ranked by only one side must still score): Spark cannot
        // broadcast a full-outer side, so the static plan is one SMJ
        // over two model-sized (queries × k) lists
        "q_hybrid_rrf" -> "RRF full-outer list fusion (model-sized)",
        // the same full-outer fusion + the LEFT OUTER qrels attach + the
        // per-query ideal-DCG inner join — all model-sized list frames
        // whose post-window stats are unknown statically; AQE broadcasts
        // at runtime where they fit
        "q_retrieval_ndcg" -> "RRF fusion + qrels + idcg list joins (x3, model-sized)",
        // the cluster-label attach: labels are corpus-sized at 100 TB
        // (one row per pair-touched doc), so the static plan keeps the
        // scale-safe SMJ; AQE converts to broadcast for small corpora —
        // the q_dedup_clusters_incremental rationale
        "q_leakage_safe_split" -> "cluster-label attach (corpus-sized at scale)")
      // formatted explain prints each node once as a "(N) SortMergeJoin"
      // heading — count headings, not substring occurrences
      val smjCount = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).size
      val expectedCounts = Map(
        "q_interval_join" -> 1, "q_importance_resample" -> 2,
        "q_dedup_incremental" -> 2, "q_dedup_clusters_incremental" -> 2,
        "q_hybrid_rrf" -> 1, "q_retrieval_ndcg" -> 3,
        "q_leakage_safe_split" -> 1)
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
