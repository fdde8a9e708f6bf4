package graft.sim

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** OPQ transform ([[Opq]]): signed-Hadamard rotation + learned variance
  * snake allocation, then PQ in the rotated space. The transform is
  * all-integer, so determinism is exact; quality is pinned in
  * [[graft.RecallSpec]] (recall >= plain PQ at the same candidate
  * fraction). */
class OpqSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("rotation matrix is orthogonal: R * R^T = d * I") {
    val d = 16
    val r = Opq.rotationMatrix(d).map(_.toArray).toArray
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(i => r(a)(i) * r(b)(i)).sum
      assert(dot === (if (a == b) d.toLong else 0L), s"rows $a,$b dot $dot")
    }
  }

  test("rotation matrix rejects non-power-of-two dims") {
    intercept[IllegalArgumentException](Opq.rotationMatrix(48))
  }

  test("snake permutation is a bijection with balanced, variance-spread subspaces") {
    val d = 16; val m = 4
    // strictly decreasing variances: rank r = dim r
    val varNum = Array.tabulate(d)(j => BigInt(1000 - j))
    val perm = Opq.snakePermutation(varNum, m)
    assert(perm.sorted.toSeq === (0 until d))
    // snake deal: ranks 0..3 -> subs 0,1,2,3; ranks 4..7 -> subs 3,2,1,0...
    val subOf = Array.tabulate(d)(p => p / (d / m))
    val bySub = perm.zipWithIndex.groupBy { case (_, p) => subOf(p) }
      .view.mapValues(_.map(_._1).toSet).toMap
    assert(bySub(0) === Set(0, 7, 8, 15))
    assert(bySub(1) === Set(1, 6, 9, 14))
    assert(bySub(2) === Set(2, 5, 10, 13))
    assert(bySub(3) === Set(3, 4, 11, 12))
    // the top-m variance dims land in m DISTINCT subspaces
    assert((0 until m).map(j => bySub.find(_._2.contains(j)).get._1).toSet.size === m)
  }

  test("transform: integer-valued doubles, width preserved, deterministic") {
    val t1 = Opq.transform(emb, m = 16).orderBy("vec_id").collect()
    val t2 = Opq.transform(emb, m = 16).orderBy("vec_id").collect()
    assert(t1.map(_.toSeq).toSeq === t2.map(_.toSeq).toSeq)
    t1.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length === 64)
      v.foreach(x => assert(x == math.rint(x), s"non-integer coord $x"))
    }
  }

  test("rotation preserves squared L2 exactly up to the d scale: |R z|^2 = d |z|^2") {
    // the identity ADC ranking rests on — grid translation cancels in
    // differences, the +-1 rotation scales squared distances by exactly d,
    // the permutation reorders coordinates; all integer-exact
    val d = 64
    val r = Opq.rotationMatrix(d)
    val zs = Seq(
      Array.tabulate(d)(i => (i * 37 % 101 - 50).toLong),
      Array.tabulate(d)(i => (i * i % 17).toLong),
      Array.fill(d)(7L))
    zs.foreach { z =>
      val rz = r.map(row => row.zip(z).map { case (a, b) => a * b }.sum)
      val lhs = rz.map(x => x * x).sum
      val rhs = d.toLong * z.map(x => x * x).sum
      assert(lhs === rhs, s"|Rz|^2 $lhs != d|z|^2 $rhs")
    }
  }

  test("VecSumAgg merge tolerates empty zero buffers on either side (sf1 regression)") {
    // zero-row partitions emit empty partial buffers; merge order is
    // arbitrary, so BOTH (full, empty) and (empty, full) must pass while
    // genuinely ragged inputs still fail loudly
    val full = Array(1L, 2L, 3L)
    assert(Similarity.VecSumAgg.merge(full.clone(), Array.emptyLongArray).toSeq === full.toSeq)
    assert(Similarity.VecSumAgg.merge(Array.emptyLongArray, full.clone()).toSeq === full.toSeq)
    intercept[IllegalArgumentException](
      Similarity.VecSumAgg.reduce(full.clone(), Array(1L)))
    val fd = Array(1.0, 2.0)
    assert(Similarity.VecSumDoubleAgg.merge(fd.clone(), Array.emptyDoubleArray).toSeq === fd.toSeq)
    assert(Similarity.VecSumDoubleAgg.merge(Array.emptyDoubleArray, fd.clone()).toSeq === fd.toSeq)
  }

  test("transform pairwise squared L2 tracks unit-space L2 within grid noise") {
    val u = PQ.unitVectors(emb.filter(col("vec_id") < 30)).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val t = Opq.transform(emb, m = 16).filter(col("vec_id") < 30)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // scale d/st^2 is common to all pairs, so RATIOS of pair distances
    // must agree between spaces up to quantization noise
    def d2(m: Map[Long, Array[Double]], a: Long, b: Long): Double =
      m(a).zip(m(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = u.keys.toSeq.sorted
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    val (ra, rb) = (pairs.head, pairs.last)
    pairs.foreach { case (a, b) =>
      val want = d2(u, a, b) / d2(u, ra._1, ra._2)
      val got = d2(t, a, b) / d2(t, ra._1, ra._2)
      assert(math.abs(want - got) <= 0.05 * math.max(want, 1.0),
        s"pair ($a,$b): unit-ratio $want vs transformed-ratio $got")
    }
    assert(d2(t, rb._1, rb._2) > 0)
  }
}
