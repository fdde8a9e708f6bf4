package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the compression tier of a 100 TB embedding
  * store, below [[Similarity.quantizeInt8]] (4× smaller) and
  * [[Similarity.ivfTopK]] (scan pruning): each vector is represented by
  * `m` small codes (one per dimension subspace; the defaults' 16×4-bit
  * codes are 8 bytes — 32× smaller than the 64-dim float vector, recall@5
  * 0.86 vs brute force at the test corpus), and search runs as asymmetric
  * distance computation
  * (ADC) — per query one small lookup table, per candidate `m` table
  * lookups and an integer add. The standard FAISS-style IVF-PQ layering
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011) recomposed for Spark.
  *
  * Everything before the float rerank is INTEGER arithmetic on a global
  * per-dimension grid, so the DuckDB oracle replays the whole pipeline —
  * grid stats, k-means training, encoding, ADC — value-exact, with none
  * of the float-summation-order caveats the IVF oracle needed order-forced
  * folds for:
  *   1. grid: per-dimension min/max over the corpus (order-independent
  *      aggregates) → `g[d] = min(floor((v[d]-dmin_d)/dscale_d), 255)`;
  *   2. codebooks: per subspace, `ksub` centroids trained by integer-L2
  *      Lloyd passes over a driver-bounded hash-sample — centroids are
  *      elementwise integer-division means, seeds are the `ksub` smallest
  *      sampled vec_ids, assignment ties break to the lowest centroid id;
  *   3. encode: scan-stage argmin against codebook LITERALS (the same
  *      plan-constant discipline as the IVF centroids and bloom bitset);
  *   4. search: the query side computes its `m × ksub` LUT once (again
  *      against literals); each (query, vector) pair costs `m` element_at
  *      lookups + adds. Candidates shuffle only (q_id, vec_id, adc)
  *      scalars; floats rejoin for the top `k × rerankFactor` survivors
  *      only, exactly like [[Similarity.quantizedTopK]]'s stage 2.
  *
  * Scale posture: the grid-stats pass is one narrow 2·dims-value
  * aggregation; training is bounded by `maxTrainSamples` (adaptive
  * hash-sample, fail-loud cap — same contract as
  * [[Similarity.kmeansCentroids]]); encode and ADC are scan-stage with
  * plan-constant codebooks; nothing wide ever shuffles.
  */
object PQ {

  /** Trained model: per-dimension grid + per-subspace integer codebooks.
    * `codebooks(s)` maps centroid id → subvector (only surviving ids —
    * a cell that empties during Lloyd drops out, in both engines). */
  final case class PqModel(dims: Int, m: Int, subDim: Int,
      dmin: Array[Double], dscale: Array[Double],
      codebooks: Array[Map[Int, Array[Long]]])

  /** (vec_id, v) with v UNIT-normalized — PQ quantizes the unit sphere so
    * its integer L2 is monotone with the cosine the rerank/oracle rank by
    * (for unit x,y: ‖x−y‖² = 2−2·x·y). Division by the graft_dot-folded
    * norm is fixed-order IEEE, replayed exactly by the oracle. */
  private[sim] def unitVectors(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("__n", greatest(sqrt(expr("graft_dot(v0, v0)")), lit(1e-12)))
      .withColumn("v", expr("transform(v0, x -> x / __n)"))
      .drop("v0", "__n")

  /** Per-dimension grid bounds as plan literals. One narrow aggregation:
    * 2·dims doubles to the driver, regardless of corpus size. */
  private def gridStats(embeddings: DataFrame, dims: Int): (Array[Double], Array[Double]) = {
    val e = unitVectors(embeddings)
    val row = e.select(
      (0 until dims).flatMap(d => Seq(
        min(element_at(col("v"), d + 1)).as(s"mn$d"),
        max(element_at(col("v"), d + 1)).as(s"mx$d"))): _*).head()
    val dmin = (0 until dims).map(d => row.getDouble(2 * d)).toArray
    val dscale = (0 until dims).map { d =>
      math.max((row.getDouble(2 * d + 1) - dmin(d)) / 256.0, 1e-12)
    }.toArray
    (dmin, dscale)
  }

  /** The grid-code expression over a unit-vector column — shared by the
    * whole-corpus and composed-frame paths so the two can't drift. */
  private def gridExprSql(uCol: String): String =
    s"""transform($uCol, (x, i) ->
       |  least(cast(floor((x - element_at(__dmin, i + 1)) /
       |    element_at(__dscale, i + 1)) as bigint), 255L))""".stripMargin

  private def withGridLits(df: DataFrame, dmin: Array[Double],
      dscale: Array[Double]): DataFrame =
    df.withColumn("__dmin", array(dmin.toIndexedSeq.map(lit): _*))
      .withColumn("__dscale", array(dscale.toIndexedSeq.map(lit): _*))

  /** (vec_id, v, g) for the whole corpus — grid codes are scan-stage
    * against the grid literals, codegen'd. */
  private def withGrid(embeddings: DataFrame, dmin: Array[Double],
      dscale: Array[Double]): DataFrame =
    withGridLits(unitVectors(embeddings), dmin, dscale)
      .withColumn("g", expr(gridExprSql("v")))
      .drop("__dmin", "__dscale")

  private def sqDistL2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train the model. The sample is the adaptive hash-gate
    * `pmod(xxhash64(vec_id), modEff) == 0` with
    * `modEff = max(1, ceil(n / (maxTrainSamples/2)))` — identity at every
    * gated SF, bounded at 100 TB, and replayed exactly by the oracle. */
  def train(embeddings: DataFrame, m: Int = 16, ksub: Int = 16,
      iters: Int = 2, maxTrainSamples: Int = 1 << 17): PqModel = {
    // dims uniformity + corpus count in ONE job (the separate
    // embeddingDims + count() calls cost a scheduler round-trip each —
    // measurable at bench granularity, pure overhead at scale)
    val meta = embeddings.select(
      min(size(col("embedding"))).as("mn"),
      max(size(col("embedding"))).as("mx"),
      count(lit(1)).as("n")).head()
    val (mnD, mxD, n) = (meta.getInt(0), meta.getInt(1), meta.getLong(2))
    require(mnD == mxD,
      s"embedding column has mixed widths ($mnD..$mxD dims); PQ requires " +
        "a uniform-dims embedding table")
    val dims = mxD
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val subDim = dims / m
    val (dmin, dscale) = gridStats(embeddings, dims)
    val modEff = math.max(1L, math.ceil(n.toDouble / (maxTrainSamples / 2).toDouble).toLong)
    val sampleRows = withGrid(embeddings, dmin, dscale)
      .filter(pmod(xxhash64(col("vec_id")), lit(modEff)) === 0L)
      .select(col("vec_id"), col("g"))
      .orderBy("vec_id")
      .limit(maxTrainSamples + 1)
      .collect()
    require(sampleRows.length <= maxTrainSamples,
      s"PQ training sample exceeds $maxTrainSamples vectors")
    require(sampleRows.length >= ksub,
      s"PQ needs >= ksub=$ksub training vectors, got ${sampleRows.length}")
    val sample: Array[(Long, Array[Long])] = sampleRows.map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toArray)

    val codebooks = (0 until m).map { s =>
      val sub = sample.map { case (id, g) =>
        id -> g.slice(s * subDim, (s + 1) * subDim) }
      // seeds: the ksub smallest sampled vec_ids; centroid id = seed rank
      var cen: Map[Int, Array[Long]] =
        sub.take(ksub).zipWithIndex.map { case ((_, v), c) => c -> v }.toMap
      for (_ <- 1 to iters) {
        // assign (tie -> lowest centroid id), then integer-mean rebuild;
        // cells that lose every member drop out (both engines agree)
        val asg = sub.map { case (id, v) =>
          val best = cen.toSeq.map { case (c, cv) => (sqDistL2(v, cv), c) }.min._2
          (best, v)
        }
        cen = asg.groupBy(_._1).map { case (c, rows) =>
          val mean = Array.tabulate(subDim) { d =>
            rows.map(_._2(d)).sum / rows.length // non-negative: floor div
          }
          c -> mean
        }
      }
      cen
    }.toArray
    PqModel(dims, m, subDim, dmin, dscale, codebooks)
  }

  /** Flattened subspace-major codebook layout shared by the two codegen
    * kernels (ids ascending within each subspace — the argmin's strict
    * `<` then keeps the lowest surviving id on ties). */
  private def flatModel(model: PqModel): (Array[Long], Array[Long], Array[Int]) = {
    val perSub = model.codebooks.map(_.toSeq.sortBy(_._1))
    val cids = perSub.flatMap(_.map(_._1.toLong))
    val off = perSub.scanLeft(0)(_ + _.size)
    val cen = perSub.flatMap(_.flatMap(_._2))
    (cen, cids, off)
  }

  /** Register a model-hashed temp function (the [[Similarity.assignCells]]
    * discipline: the name keys the MODEL so two models never alias) and
    * return the call. */
  private def registerKernel(spark: SparkSession, model: PqModel,
      kind: String, build: (org.apache.spark.sql.catalyst.expressions.Expression,
        Array[Long], Array[Long], Array[Int]) =>
        org.apache.spark.sql.catalyst.expressions.Expression): String = {
    val (cen, cids, off) = flatModel(model)
    val bytes = java.nio.ByteBuffer.allocate(8 * (cen.length + cids.length + off.length + 2))
    cen.foreach(bytes.putLong); cids.foreach(bytes.putLong)
    off.foreach(o => bytes.putLong(o.toLong))
    bytes.putLong(model.m.toLong); bytes.putLong(model.subDim.toLong)
    val fname = f"graft_pq_${kind}_${graft.functions.Fnv1a64Helper.hashBytes(bytes.array())}%016x"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname,
      exprs => {
        require(exprs.size == 1, s"$fname takes 1 argument, got ${exprs.size}")
        build(exprs.head, cen, cids, off)
      },
      "built-in")
    fname
  }

  /** (vec_id, codes array) — scan-stage codegen kernel over the
    * plan-constant codebooks (the expression-tree argmin this replaces
    * cost 80 s/1M vectors; the kernel does the same integer flops in one
    * tight loop — 1.5 s, see SCALING.md r8). */
  private def encodeCodes(embeddings: DataFrame, model: PqModel): DataFrame = {
    val fname = registerKernel(embeddings.sparkSession, model, "encode",
      (g, cen, cids, off) =>
        graft.functions.PqEncode(g, cen, cids, off, model.m, model.subDim))
    withGrid(embeddings, model.dmin, model.dscale)
      .withColumn("codes", expr(s"$fname(g)"))
      .select("vec_id", "codes")
  }

  /** Encoded corpus: (vec_id, code_0..code_{m-1}) — the `m`-byte
    * representation. Fully integer → exact DuckDB oracle. */
  def encode(embeddings: DataFrame, model: PqModel): DataFrame = {
    val coded = encodeCodes(embeddings, model)
    coded.select(col("vec_id") +:
      (0 until model.m).map(s =>
        element_at(col("codes"), s + 1).as(s"code_$s")): _*)
  }

  /** One registered-query wrapper: train + encode with defaults. */
  def encodeQuery(embeddings: DataFrame, m: Int = 16, ksub: Int = 16,
      iters: Int = 2): DataFrame =
    encode(embeddings, train(embeddings, m, ksub, iters))

  /** ADC top-k: per query an `m × ksub`-entry LUT of integer subspace
    * distances (built against codebook literals), per candidate `m`
    * lookups + adds; `k × rerankFactor` survivors rerank on the float
    * originals (rounded cosine, the shared output contract of every
    * search query in [[Similarity]]). */
  def topK(embeddings: DataFrame, model: PqModel, numQueries: Long, k: Int,
      rerankFactor: Int = 4, rerankOn: DataFrame = null): DataFrame = {
    // `rerankOn` (default: the coded corpus itself) supplies the float
    // vectors for the exact-rerank stage — [[Opq]] codes a ROTATED view
    // of the corpus but reranks on the originals so cos_sim keeps the
    // shared output contract of every search query
    val all = Similarity.withNorm(Option(rerankOn).getOrElse(embeddings))
    val coded = encodeCodes(embeddings, model)

    // flattened LUT: entry (s, c) at position s*ksubMax + c + 1 (dropped
    // centroid slots hold Long.MaxValue so positions stay aligned) — one
    // kernel call per query row against the plan-constant codebooks
    val ksubMax = model.codebooks.map(b => b.keys.max + 1).max
    val lutFn = registerKernel(embeddings.sparkSession, model, "lut",
      (g, cen, cids, off) =>
        graft.functions.PqLut(g, cen, cids, off, model.m, model.subDim,
          ksubMax))
    val queries = withGrid(embeddings, model.dmin, model.dscale)
      .filter(col("vec_id") < numQueries)
      .withColumn("lut", expr(s"$lutFn(g)"))
      .select(col("vec_id").as("q_id"), col("lut"))

    val adc = expr(s"""aggregate(
      zip_with(sequence(0L, ${model.m - 1}), codes,
        (s, c) -> element_at(lut, cast(s * $ksubMax + c + 1 as int))),
      0L, (a, x) -> a + x)""")
    val candW = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc").asc, col("vec_id").asc)
    val cands = coded.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("__adc", adc)
      .select("q_id", "vec_id", "__adc")
      .withColumn("__rn", row_number().over(candW))
      .filter(col("__rn") <= k * rerankFactor)

    val qv = all.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cands
      .join(all, "vec_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.dot("qv", "v") / (col("qnorm") * col("norm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Registered-query wrapper: train + search with defaults. */
  def topKQuery(embeddings: DataFrame, numQueries: Long, k: Int,
      m: Int = 16, ksub: Int = 16, iters: Int = 2,
      rerankFactor: Int = 8): DataFrame =
    topK(embeddings, train(embeddings, m, ksub, iters), numQueries, k,
      rerankFactor)

  /** IVF-PQ — the full FAISS layering, composed from the two existing
    * tiers: the coarse quantizer PRUNES (each query touches only its
    * `nprobe` cells — the [[Similarity.ivfSearch]] contract), the PQ
    * codes SCORE (ADC over 8-byte codes — 1/32 of the float bytes), and
    * floats rerank only the `k × rerankFactor` survivors. At 100 TB this
    * is the shape that works: candidate generation is a cell EQUI-join
    * against a broadcast probe set (no corpus shuffle, no inequality
    * fan-out), and the scored bytes are the compressed tier.
    *
    * One corpus scan derives everything per vector — raw norm (coarse
    * assignment + rerank are cosine on RAW vectors, bit-matching the IVF
    * oracle fragment), unit-grid codes, coarse cell ([[graft.functions
    * .IvfAssign]] kernel), PQ codes ([[graft.functions.PqEncode]]
    * kernel) — so the composition adds zero extra passes over plain PQ.
    * Fully oracle-replayed: IVF training/probes CTEs + PQ codebook CTEs
    * composed in SQL exactly as here. */
  def ivfPqTopK(embeddings: DataFrame, numQueries: Long, k: Int,
      centroidStride: Int = 23, nprobe: Int = 14, kmeansIters: Int = 2,
      m: Int = 16, ksub: Int = 16, iters: Int = 2,
      rerankFactor: Int = 8): DataFrame = {
    val all = Similarity.withNorm(embeddings)
    val coarse = Similarity.kmeansCentroids(all, centroidStride, kmeansIters)
    val model = train(embeddings, m, ksub, iters)
    ivfPqSearch(embeddings, coarse, model, numQueries, k, nprobe,
      rerankFactor)
  }

  /** IVF-PQ search against pre-trained models (factored from
    * [[ivfPqTopK]] like [[Similarity.ivfSearch]] — index build is a
    * one-off cost amortized across queries; this is the per-query-set
    * path). */
  def ivfPqSearch(embeddings: DataFrame, coarse: DataFrame, model: PqModel,
      numQueries: Long, k: Int, nprobe: Int = 14,
      rerankFactor: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    val all = Similarity.withNorm(embeddings)
    val encFn = registerKernel(spark, model, "encode",
      (g, cen, cids, off) =>
        graft.functions.PqEncode(g, cen, cids, off, model.m, model.subDim))
    val ksubMax = model.codebooks.map(b => b.keys.max + 1).max
    val lutFn = registerKernel(spark, model, "lut",
      (g, cen, cids, off) =>
        graft.functions.PqLut(g, cen, cids, off, model.m, model.subDim,
          ksubMax))

    // ONE scan: raw v/norm (assignment + rerank), unit grid -> PQ codes,
    // coarse cell — two codegen kernels and the grid expr, zero joins
    val coded = withGridLits(
        Similarity.assignCells(all, coarse), model.dmin, model.dscale)
      .withColumn("__u", expr(
        "transform(v, x -> x / greatest(norm, 1e-12))"))
      .withColumn("codes", expr(s"$encFn(${gridExprSql("__u")})"))
      .select("vec_id", "cell", "codes")

    // queries probe their nprobe nearest cells (the ivfSearch contract)
    // and carry their ADC LUT
    val queries = withGridLits(all.filter(col("vec_id") < numQueries),
        model.dmin, model.dscale)
      .withColumn("__u", expr(
        "transform(v, x -> x / greatest(norm, 1e-12))"))
      .withColumn("lut", expr(s"$lutFn(${gridExprSql("__u")})"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("lut"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("__qcsim").desc, col("c_id"))
    val probes = queries.join(broadcast(coarse))
      .withColumn("__qcsim",
        Similarity.dot("qv", "cv") / (col("qnorm") * col("cnorm")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("lut"), col("c_id").as("cell"))

    val adc = expr(s"""aggregate(
      zip_with(sequence(0L, ${model.m - 1}), codes,
        (s, c) -> element_at(lut, cast(s * $ksubMax + c + 1 as int))),
      0L, (a, x) -> a + x)""")
    val candW = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc").asc, col("vec_id").asc)
    val cands = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("__adc", adc)
      .select("q_id", "vec_id", "__adc")
      .withColumn("__rn", row_number().over(candW))
      .filter(col("__rn") <= k * rerankFactor)

    val qv = all.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("norm").as("qnorm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cands
      .join(all, "vec_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.dot("qv", "v") / (col("qnorm") * col("norm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
