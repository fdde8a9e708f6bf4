package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession tuned for this engine.
  *
  * Sets the confs every graft workload needs — UTC (oracle parity), AQE
  * (runtime coalescing + skew-join splitting), nanos-as-long parquet reads
  * (the corpus's TIMESTAMP(NANOS) columns), right-sized shuffle
  * parallelism — and registers the custom function surface. On a real
  * cluster pass the same settings via spark-submit and
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftSession {

  def create(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val cores = master match {
      case s if s.startsWith("local[") && s.endsWith("]") =>
        s.stripPrefix("local[").stripSuffix("]") match {
          case "*" => Runtime.getRuntime.availableProcessors()
          case n => n.toInt
        }
      case _ => 200
    }
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // planner strategy: rank-filter windows -> bounded-heap top-k
    // (idempotent assignment; also installable cluster-wide via
    // spark.sql.extensions=graft.functions.GraftExtensions)
    spark.experimental.extraStrategies = Seq(graft.plans.BoundedTopKStrategy)
    spark
  }
}
