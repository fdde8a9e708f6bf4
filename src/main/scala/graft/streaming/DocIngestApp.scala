package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.text.TextAnalysis

/** Application entrypoint for the CONTINUOUS training-data ingest side —
  * the streaming twin of the batch curation pipeline
  * (`TextAnalysis.curate` / `q_corpus_curate`): documents arrive as files
  * (prod: an object-store drop zone or a Kafka topic behind the same
  * seam), get annotated in the scan stage, deduplicated with
  * watermark-bounded state, gated, and land in a curated store — plus a
  * near-dup candidate side-channel feeding the offline cluster
  * resolution (`Dedup.dupClusters`), which needs global connected
  * components and therefore stays a batch job over the accumulated
  * candidate log.
  *
  * Pipeline shape and why it scales: annotation (language scores,
  * quality, token counts) is pure per-row arithmetic reused verbatim from
  * the batch operators ([[TextAnalysis.annotate]] — one definition, no
  * drift); exact dedup keys state by content digest (32 bytes/doc, never
  * the text); near-dup candidates key state by (band, bucket) with
  * capped residents. No stage shuffles the document text.
  *
  * Run: `spark-submit --class graft.streaming.DocIngestApp <jar> <srcDir> <outBase>`
  */
object DocIngestApp {

  /** Ingest knobs, resolved with the same discipline as [[graft.GraftConfig]]
    * (spark conf > env var > oracle-verified default — the defaults are
    * exactly `q_corpus_curate`'s arguments, so an unconfigured ingest
    * reproduces the batch curator). */
  final case class IngestConfig(lang: String, minQuality: Double,
      watermarkDelay: String)

  object IngestConfig {
    private def resolve(spark: SparkSession, sparkKey: String,
        envKey: String, default: String): String =
      spark.conf.getOption(s"spark.graft.$sparkKey")
        .orElse(sys.env.get(envKey))
        .getOrElse(default)

    def load(spark: SparkSession): IngestConfig = IngestConfig(
      lang = resolve(spark, "ingestLang", "GRAFT_INGEST_LANG", "en"),
      minQuality = resolve(spark, "ingestMinQuality",
        "GRAFT_INGEST_MIN_QUALITY", "0.5").toDouble,
      watermarkDelay = resolve(spark, "ingestWatermarkDelay",
        "GRAFT_INGEST_WATERMARK_DELAY", "1 hour"))
  }

  /** Source schema: the `documents` table plus an `ingest_ts` event-time
    * column (prod: producer timestamp / object-store mtime). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("ingest_ts", TimestampType)))

  /** Deduped + annotated + gated curated stream. Gate order matters at
    * scale: dedup FIRST so near-duplicate floods (crawler replays,
    * boilerplate storms) are collapsed before the annotation columns are
    * even computed for the copies... except annotation is per-row scan
    * work either way, so the real reason is semantic: the batch curator
    * gates the dedup KEEPER, and gating after dedup reproduces that
    * (identical text ⇒ identical gate verdicts, so WHICH copy survives
    * cannot change the curated set — asserted digest-for-digest against
    * `TextAnalysis.curate` in DocIngestAppSpec). */
  def curatedStream(docs: DataFrame, lang: String, minQuality: Double,
      watermarkDelay: String = "1 hour"): DataFrame =
    TextAnalysis.annotate(DocStream.exactDeduped(docs, watermarkDelay))
      .filter(col("pred_lang") === lang && col("quality_score") >= minQuality)
      .select("doc_id", "ingest_ts", "text", "pred_lang", "quality_score",
        "n_tokens")

  /** Start the ingest: curated parquet + near-dup candidate log, each
    * checkpointed under `outBase/_checkpoints/<name>` (restart resumes —
    * same discipline as [[GraftApp]]). */
  def start(spark: SparkSession, srcDir: String, outBase: String,
      lang: String = "en", minQuality: Double = 0.5,
      watermarkDelay: String = "1 hour"): Seq[StreamingQuery] = {
    val docs = spark.readStream.schema(docSchema).parquet(srcDir)

    def sink(df: DataFrame, name: String): StreamingQuery =
      df.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$outBase/_checkpoints/$name")
        .format("parquet")
        .option("path", s"$outBase/$name")
        .queryName(name)
        .start()

    Seq(
      sink(curatedStream(docs, lang, minQuality, watermarkDelay), "curated"),
      sink(DocStream.nearDupCandidates(spark, docs, watermarkDelay).toDF(),
        "neardup_candidates"))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/tmp/graft_doc_in")
    val outBase = args.lift(1).getOrElse("/tmp/graft_doc_out")
    val spark = GraftSession.create(appName = "graft-doc-ingest")
    val cfg = IngestConfig.load(spark)
    val queries = start(spark, srcDir, outBase,
      lang = cfg.lang, minQuality = cfg.minQuality,
      watermarkDelay = cfg.watermarkDelay)
    queries.foreach(_.awaitTermination())
  }
}
