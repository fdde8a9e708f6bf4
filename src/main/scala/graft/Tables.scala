package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test corpus (see /root/repo/TESTDATA.md).
  *
  * Scale posture: every loader returns a plain parquet scan so Catalyst can
  * push filters / prune columns into the file source. Nothing here collects,
  * caches, or repartitions — partitioning decisions belong to the operators.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events corpus has shipped with two physical encodings for `ts`:
    * parquet TIMESTAMP(NANOS) (readable only as LongType via
    * `spark.sql.legacy.parquet.nanosAsLong`, set in [[GraftSession]]) and
    * parquet timestamp[us] (read as TIMESTAMP_NTZ). [[deriveEventTime]]
    * adapts to whichever the files carry; loaders make no assumption.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // belt-and-suspenders for sessions not built via GraftSession: a
    // nanos-encoded corpus is unreadable without this conf (ADVICE r7)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveEventTime(table(spark, sfDir, "events"))
  }

  /** Schema-adaptive event-time derivation. Accepts the raw frame with `ts`
    * as TIMESTAMP / TIMESTAMP_NTZ (micros) or LongType (epoch-nanos), or an
    * already-renamed `ts_ns` long, and emits the engine's event-time
    * contract regardless of source encoding:
    *   - `ts_ns`      LongType epoch-nanos (raw resolution)
    *   - `ts_us`      LongType epoch-micros (exact integer event time; all
    *                  window arithmetic uses this to stay engine-agnostic)
    *   - `event_ts`   TimestampType at micros (matches the DuckDB oracle's
    *                  CAST(ts AS TIMESTAMP))
    * Requires session timezone UTC (GraftSession sets it) so the NTZ cast
    * is epoch-exact.
    */
  def deriveEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Long-sourced ns values (parquet int64 or a caller-renamed ts_ns) are a
    // CLAIM of nanos, not a guarantee — if a caller mislabels micros/millis
    // as ts_ns, every window/join downstream silently drifts 1000×
    // (VERDICT r6/r7's recurring bug class). Guard per-row in codegen:
    // modern epoch-nanos are ≥1e17 (~1973-03); a positive value below that
    // is micros/millis/seconds wearing the wrong label → loud error.
    // Nulls and non-positive values pass (pre-1970 nanos are negative).
    val fromLong = df.columns.contains("ts_ns") ||
      df.schema("ts").dataType == LongType
    val minPlausibleNs = 100000000000000000L // 1e17
    val withNs =
      if (df.columns.contains("ts_ns")) df
      else df.schema("ts").dataType match {
        case LongType => df.withColumnRenamed("ts", "ts_ns")
        case TimestampType | TimestampNTZType =>
          // select (not withColumn+drop) keeps ts_ns at ts's position
          val tsNs = (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts_ns")
          df.select(df.columns.map(c => if (c == "ts") tsNs else col(c)).toSeq: _*)
        case other => throw new IllegalArgumentException(
          s"events.ts has unsupported type $other — expected TIMESTAMP, TIMESTAMP_NTZ, or BIGINT epoch-nanos")
      }
    val guarded =
      if (!fromLong) withNs
      else withNs.withColumn("ts_ns",
        when(col("ts_ns").isNull || col("ts_ns") <= 0L ||
            col("ts_ns") >= minPlausibleNs, col("ts_ns"))
          .otherwise(raise_error(concat(
            lit("[graft] ts_ns unit mismatch: "), col("ts_ns").cast("string"),
            lit(s" is positive but < 1e17 — epoch-micros/millis mislabeled as nanos? " +
              "Pass the raw frame to Tables.deriveEventTime instead of renaming.")))))
    guarded.withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
  }

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  /** Committed golden binary-media fixture (repo `testdata/media/`,
    * written by `scripts/gen_media.py`): genuine `binary` payloads with
    * format magic headers + full-range 0..255 bytes (non-ASCII
    * guaranteed) beside typed metadata columns — the multimodal queries'
    * input. Fixed-size by design (a fixture, not a scaled corpus): the
    * byte-level oracle cost stays constant across SFs. Override the
    * location with GRAFT_MEDIA_PATH. */
  def media(spark: SparkSession): DataFrame =
    spark.read.parquet(sys.env.getOrElse("GRAFT_MEDIA_PATH",
      "/root/repo/testdata/media/media.parquet"))

  /** Schema tripwire (see VERDICT r6 item 2): diff every corpus table's
    * on-disk parquet schema against the expected column→type map and fail
    * with ONE loud message naming every mismatch, instead of letting a
    * silent encoding drift surface as dozens of opaque per-query analysis
    * errors. `ts` deliberately admits both corpus encodings (timestamp
    * micros and int64-nanos) — [[deriveEventTime]] adapts to either.
    * Metadata-only (schema reads, no data scan); called at Verify/Bench
    * startup.
    */
  def schemaProbe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.types._
    // expected logical types, pinned against /root/testdata as of r7.
    // Sentinels: Ts = any event-time encoding deriveEventTime adapts to
    // (timestamp micros / int64-nanos); Dt = the timestamp-typed "date"
    // columns the queries consume via string-literal compare + cast (either
    // TZ flavor fine, a flip to long would break them → flagged).
    object Ts; object Dt
    val expected: Map[String, Seq[(String, Any)]] = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> Dt, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> Dt),
      "events" -> Seq("event_id" -> LongType, "ts" -> Ts,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))
    def ok(exp: Any, got: DataType): Boolean = (exp, got) match {
      case (Ts, TimestampType | TimestampNTZType | LongType) => true
      case (Dt, TimestampType | TimestampNTZType | DateType) => true
      case (ArrayType(e, _), ArrayType(g, _)) => e == g // element nullability: reader's choice
      case (e: DataType, g) => e == g
      case _ => false
    }
    def show(exp: Any): String = exp match {
      case Ts => "TIMESTAMP[_NTZ]|BIGINT-nanos"
      case Dt => "TIMESTAMP[_NTZ]|DATE"
      case e => e.toString
    }
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      try {
        val actual = spark.read.parquet(s"$sfDir/$name.parquet").schema
        val byName = actual.fields.map(f => f.name -> f.dataType).toMap
        cols.flatMap { case (c, exp) =>
          byName.get(c) match {
            case None => Some(s"$name.$c: MISSING (have: ${actual.fieldNames.mkString(",")})")
            case Some(got) if !ok(exp, got) =>
              Some(s"$name.$c: expected ${show(exp)}, found $got")
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"$name: unreadable (${e.getMessage})")
      }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      s"[graft] corpus schema drift at $sfDir — fix Tables loaders before trusting any query result:\n  " +
        problems.mkString("\n  "))
  }

  /** Register every corpus table as a temp view + the parsed-transaction
    * view, giving users an ad-hoc `spark.sql` surface over the engine
    * (the reference has no SQL at all — with Catalyst it comes free). */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")
      .foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
    graft.cdc.EnvelopeOps.parsedTransactions(events(spark, sfDir))
      .createOrReplaceTempView("transactions")
    graft.functions.GraftFunctions.register(spark)
  }
}
