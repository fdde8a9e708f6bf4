package graft.text

import graft.SparkSpecBase

class CollocationsSpec extends SparkSpecBase {
  import spark.implicits._

  private def got(texts: Seq[String], minCount: Long) =
    TextAnalysis.collocations(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  /** Plain-Scala replay: same counts, same one-expression double PMI,
    * same micro-nat floor. */
  private def model(texts: Seq[String], minCount: Long) = {
    val toks = texts.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, g) =>
      t -> g.size.toLong
    }
    val tUni = uni.values.sum
    val bgs = toks.flatMap(w => w.zip(w.drop(1)))
    val tBi = bgs.size.toLong
    bgs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= minCount)
      .map { case ((w1, w2), c) =>
        val pmi = math.floor(math.log(
          (c / tBi.toDouble) /
            ((uni(w1) / tUni.toDouble) * (uni(w2) / tUni.toDouble))) * 1e6)
          .toLong
        (w1, w2) -> (c, uni(w1), uni(w2), pmi)
      }
  }

  test("collocation beats independence: the glued pair scores positive, " +
      "a chance pair scores lower, counts match the replay") {
    // "new york" always adjacent; "the cat"/"the dog" mix freely
    val texts = Seq(
      "new york is big", "i love new york", "new york new york",
      "the cat saw the dog", "the dog saw the cat", "the cat the dog")
    val g = got(texts, minCount = 2)
    assert(g == model(texts, 2))
    assert(g(("new", "york"))._4 > 0)
    assert(g(("new", "york"))._4 > g(("the", "cat"))._4)
  }

  test("minCount prunes hapax pairs; sub-2-token docs contribute nothing") {
    val texts = Seq("alpha beta", "alpha beta", "gamma delta", "solo", "")
    val g = got(texts, minCount = 2)
    assert(g.keySet == Set(("alpha", "beta")))
    assert(g == model(texts, 2))
  }

  test("randomized corpora match the replay exactly") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val texts = (1 to 30).map(_ =>
      (1 to (2 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(5)))
        .mkString(" "))
    assert(got(texts, 3) == model(texts, 3))
  }
}
