package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.dedup.MinHashLSH
import graft.text.TextAnalysis

/** The document-ingest application end to end over real corpus files:
  * curated output must match the batch curator digest-for-digest, and the
  * candidate log must match batch banding. */
class DocIngestAppSpec extends SparkSpecBase {

  import spark.implicits._

  test("file-streamed ingest == batch curate + batch banding candidates") {
    val srcDir = Files.createTempDirectory("graft_di_src").toString
    val outBase = Files.createTempDirectory("graft_di_out").toString

    // sf0.001 documents + a synthetic event-time, split into 3 file chunks
    val docs = Tables.documents(spark, sf0001)
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1000L) + col("doc_id")))
    val n = docs.count()
    Seq(0, 1, 2).foreach { c =>
      docs.filter(pmod(col("doc_id"), lit(3)) === c)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$srcDir/_stage_$c")
      val part = new java.io.File(s"$srcDir/_stage_$c").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/chunk_$c.parquet"))
    }

    val queries = DocIngestApp.start(spark, srcDir, outBase)
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // curated: same digests and count as the batch curator (which copy of
    // an exact-dup group survives depends on arrival order, but identical
    // text means identical gate verdicts, so the digest set is invariant)
    val gotCurated = spark.read.parquet(s"$outBase/curated")
    val batchIds = TextAnalysis.curate(
        Tables.documents(spark, sf0001), lang = "en", minQuality = 0.5)
      .select("doc_id")
    val wantDigests = Tables.documents(spark, sf0001)
      .join(batchIds, "doc_id")
      .select(sha2(lower(trim(col("text"))), 256).as("d"))
      .as[String].collect().toSet
    val gotDigests = gotCurated
      .select(sha2(lower(trim(col("text"))), 256).as("d"))
      .as[String].collect().toSet
    assert(gotDigests === wantDigests)
    assert(gotCurated.count() === wantDigests.size.toLong)
    assert(gotCurated.count() > 0)

    // near-dup candidate log: distinct pairs == batch banding pairs
    val gotPairs = spark.read.parquet(s"$outBase/neardup_candidates")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    val wantPairs = MinHashLSH.bandingCandidates(
        MinHashLSH.signatures(Tables.documents(spark, sf0001)))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(gotPairs === wantPairs)
    assert(gotPairs.nonEmpty)
    assert(n > 0)
  }
}
