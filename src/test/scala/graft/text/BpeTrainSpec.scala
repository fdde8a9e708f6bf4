package graft.text

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference BPE trainer: plain-Scala replay of Sennrich et al.'s
    * get_stats/merge_vocab loop (pairs counted per adjacent position,
    * greedy leftmost non-overlapping merge, tie-break count DESC then
    * pair string ASC). */
  private def modelTrain(words: Map[String, Long],
      rounds: Int): Seq[(String, String, String, Long)] = {
    var vocab: Map[String, (Vector[String], Long)] =
      words.map { case (w, f) => w -> (w.map(_.toString).toVector :+ "_", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, s"$a $b") }
        out += ((a, b, a + b, n))
        vocab = vocab.map { case (w, (syms, f)) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          w -> (merged.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("train == reference BPE model on a corpus with ties and repeats") {
    // 'aaaa' exercises overlapping same-symbol runs; low/lowest share a
    // prefix; tie-break paths hit once counts collide
    val docs = Seq(
      "low low low low lowest lowest aaaa aaaa aaaa",
      "new newest newest low aaaa ab ab ab ab ab")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val wordFreq = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = modelTrain(wordFreq, rounds = 8)
    val got = BpeTrain.train(docs, rounds = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === want)
  }

  test("applyMerge: greedy leftmost non-overlapping fold semantics") {
    // same-symbol run: 'a a a' -> 'aa a' (leftmost pair wins, no overlap)
    val df = Seq(("x", 1L, "a a a _"), ("y", 1L, "b a a b _"),
      ("z", 1L, "a b a b _")).toDF("word", "freq", "cur")
    val got = BpeTrain.applyMerge(df, "a", "a")
      .select("word", "cur").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("x") === "aa a _")
    assert(got("y") === "b aa b _")
    assert(got("z") === "a b a b _")
    val ab = BpeTrain.applyMerge(df, "a", "b")
      .select("word", "cur").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ab("z") === "ab ab _", "both disjoint matches must merge")
    assert(ab("y") === "b a ab _")
    // merged symbols are atomic: 'aa' does not match lhs 'a'
    val again = BpeTrain.applyMerge(
      Seq(("x", 1L, "aa a _")).toDF("word", "freq", "cur"), "a", "_")
      .select("cur").head().getString(0)
    assert(again === "aa a_", "suffix test must match whole symbols only")
  }

  test("train is partition-layout invariant (deterministic argmax)") {
    val docs = Tables.documents(spark, sf0001).limit(120)
    val a = BpeTrain.train(docs, rounds = 4).collect().toSeq
    val b = BpeTrain.train(docs.repartition(13), rounds = 4).collect().toSeq
    assert(a === b)
  }

  test("tokenize: word totals conserved, merges only shrink token counts") {
    val docs = Tables.documents(spark, sf0001).limit(100)
    val nWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$")).count()
    val zero = BpeTrain.tokenize(docs, Nil)
      .agg(sum("n_words"), sum("n_tokens")).head()
    assert(zero.getLong(0) === nWords)
    // no merges: every word tokenizes to chars + end marker
    val charsPlusEnd = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg(sum(length(col("w")) + 1)).head().getLong(0)
    assert(zero.getLong(1) === charsPlusEnd)
    val merges = BpeTrain.train(docs, rounds = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val trained = BpeTrain.tokenize(docs, merges)
      .agg(sum("n_words"), sum("n_tokens")).head()
    assert(trained.getLong(0) === nWords, "tokenization must keep every word")
    assert(trained.getLong(1) < charsPlusEnd,
      "6 merges over this corpus must compress the token stream")
  }
}
