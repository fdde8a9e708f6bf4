package graft

/** Dev tool: prove the `spark.sql.extensions=graft.functions.GraftExtensions`
  * install path end-to-end — resolves the custom functions WITHOUT calling
  * `GraftFunctions.register`. Run via spark-submit (scripts/check_extensions.sh). */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = spark.sql("SELECT graft_fnv64('foobar') AS h").head().getLong(0)
    val n = spark.sql("SELECT size(graft_winnow('the quick brown fox jumps over it', 8, 4)) AS n")
      .head().getInt(0)
    println(s"EXTCHECK fnv64=$h winnow_n=$n " +
      (if (h == 0x85944171f73967e8L && n > 0) "OK" else "MISMATCH"))
    spark.stop()
  }
}
