package graft

/** Dev tool: prove the `spark.sql.extensions=graft.functions.GraftExtensions`
  * install path end-to-end — resolves the custom functions AND plans the
  * rank-filter rewrite WITHOUT any code-side register call. Run via
  * spark-submit (scripts/check_extensions.sh). */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = spark.sql("SELECT graft_fnv64('foobar') AS h").head().getLong(0)
    val n = spark.sql("SELECT size(graft_winnow('the quick brown fox jumps over it', 8, 4)) AS n")
      .head().getInt(0)
    // the injected planner strategy must fire on the rank-filter idiom
    val topk = spark.sql(
      """SELECT * FROM (
        |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |  FROM VALUES ('a', 1), ('a', 2), ('a', 3), ('b', 9) AS t(g, v)
        |) WHERE rn <= 2""".stripMargin)
    val planOk = topk.queryExecution.executedPlan.toString.contains("BoundedTopK")
    val rows = topk.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val rowsOk = rows == Set(("a", 3, 1), ("a", 2, 2), ("b", 9, 1))
    // the Avro wire serde functions resolve and round-trip through SQL
    // (op 'x' exercises the string + union-null paths of the envelope)
    val avroOk = spark.sql(
      """SELECT graft_avro_decode(
        |  graft_avro_encode(named_struct('op', 'x'), 'transactions', 7),
        |  'transactions').op AS op""".stripMargin)
      .head().getString(0) == "x"
    // Morton interleave kernel: 5 = 101b, 3 = 011b -> z = 011011b = 27
    val zOk = spark.sql("SELECT graft_zorder(5L, 3L, 16) AS z")
      .head().getLong(0) == 27L
    println(s"EXTCHECK fnv64=$h winnow_n=$n topk_plan=$planOk avro=$avroOk zorder=$zOk " +
      (if (h == 0x85944171f73967e8L && n > 0 && planOk && rowsOk && avroOk && zOk) "OK"
       else "MISMATCH"))
    spark.stop()
  }
}
