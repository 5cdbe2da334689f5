package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VecOps

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *   - brute-force cosine top-k: the exactness baseline. The query set is
  *     broadcast (it is small by construction), so the scan of the corpus
  *     stays embarrassingly parallel — no shuffle of the big side;
  *   - random-hyperplane LSH bucketing: the 100 TB path. Vectors hash to
  *     `tables` independent bucket keys; search touches only colliding
  *     buckets. Recall is tunable via tables × bits.
  *
  * Cosine math is explicit double-precision expression composition
  * (zip_with + aggregate fold) — deterministic, codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double via
    * the codegen'd `FloatVecDot` (identical accumulation order to the
    * `aggregate(zip_with(...))` fold, ~40× faster on pair scans).
    */
  def cosine(a: Column, b: Column): Column =
    VecOps.dot(a, b) / (VecOps.norm(a) * VecOps.norm(b))

  /** All pairs (id_a < id_b) with cosine ≥ threshold, via a size-bounded
    * self-join. Norms are computed once per row before the pair join, so
    * the O(n²) stage does one codegen'd dot per pair. Only for corpora
    * small enough to pair exhaustively — at scale use `lshNearDups`.
    */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // The O(n²) scan parallelizes over the stream side's partitions —
    // a few-row-group input would run it single-threaded.
    val n = graft.sources.Tables.rebalanceForCompute(
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        VecOps.norm(col(vecCol)).as("nrm")))
    val a = n.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = n.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(VecOps.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact top-k neighbors for each query vector (brute force): the query
    * side is broadcast, the corpus is scanned once with precomputed norms,
    * ranking is a window over the (small) query-id partition.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      VecOps.norm(col(vecCol)).as("q_nrm")))
    val c = graft.sources.Tables.rebalanceForCompute(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        VecOps.norm(col(vecCol)).as("c_nrm")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(VecOps.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6))
      .select("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** Bitext-style mutual-top-1 mining (LASER/CCMatrix family): the pairs
    * `(a, b)` where `b` is `a`'s cosine nearest neighbor in B AND `a` is
    * `b`'s nearest in A. Mutuality is the classic precision filter for
    * parallel-corpus mining: one-directional nearest neighbors are full
    * of hubs; mutual pairs are overwhelmingly true alignments.
    *
    * Scale shape: two [[bruteForceTopK]] passes (broadcast query side,
    * one corpus scan each) and an equality join of two id-pair tables.
    * For corpus-×-corpus scale, feed the LSH/IVF top-k variants instead —
    * the mutuality join is identical.
    */
  def mutualTop1(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val ab = bruteForceTopK(b, a, idCol, vecCol, k = 1)
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("cos"))
    val ba = bruteForceTopK(a, b, idCol, vecCol, k = 1)
      .select(col("neighbor_id").as("id_a"), col("query_id").as("id_b"))
    ab.join(ba, Seq("id_a", "id_b"))
  }

  /** Contrastive hard-negative mining: for each query, the k most
    * cosine-similar corpus vectors with a DIFFERENT label — the pairs an
    * embedding-model trainer wants as in-batch negatives (similar enough
    * to be hard, labeled differently so they are true negatives).
    * Same scale shape as [[bruteForceTopK]]: broadcast query side, one
    * corpus scan with precomputed norms, bounded-heap top-k.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), col(vecCol).as("q_vec"),
      VecOps.norm(col(vecCol)).as("q_nrm")))
    val c = graft.sources.Tables.rebalanceForCompute(
      corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("n_label"), col(vecCol).as("c_vec"),
        VecOps.norm(col(vecCol)).as("c_nrm")))
    val scored = q.join(c,
        col("query_id") =!= col("neighbor_id") &&
          col("q_label") =!= col("n_label"))
      .withColumn("cos",
        round(VecOps.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6))
      .select("query_id", "q_label", "neighbor_id", "n_label", "cos")
    val top = graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
  }

  /** Shared ranking tail: the custom bounded-heap TopKPerKey operator
    * prunes to k rows per query WITHOUT sorting each partition (O(n log k)
    * vs the window formulation's full per-partition sort — the difference
    * at billions of scored candidate pairs), then a row_number over the
    * tiny surviving groups assigns ranks reusing the same partitioning
    * (no second shuffle).
    */
  private def rankTopK(scored: DataFrame, k: Int,
      scoreCol: String = "cos"): DataFrame = {
    val top = graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col(scoreCol).desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col(scoreCol).desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select("query_id", "neighbor_id", scoreCol, "rank")
  }

  /** Late-interaction MaxSim top-k (the ColBERT scoring shape, public —
    * Khattab & Zaharia 2020): each vector is split into `chunks`
    * subvectors, and score(q, d) = Σ over q's chunks of the MAX dot
    * product against any of d's chunks — token-level matching that a
    * single pooled dot washes out. Chunk dots are rounded to micro
    * integers BEFORE max/sum, so ranking is exact and order-free (max
    * and sum of integers commute across any partitioning).
    *
    * Scale shape: the query side is broadcast as chunk rows; the corpus
    * explodes to `chunks` rows per vector in a narrow generate and is
    * scanned once (codegen'd `FloatVecDot` per chunk pair); ranking
    * goes through the bounded-heap TopKPerKey operator. Per-query work
    * is `chunks²·|corpus|` dots — at 100 TB, run it behind an ANN
    * candidate stage (IVF/LSH) exactly like brute-force cosine.
    */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, chunks: Int = 4, dims: Int = 64): DataFrame = {
    require(chunks >= 1 && dims % chunks == 0,
      s"dims ($dims) must divide into chunks ($chunks)")
    val clen = dims / chunks
    def chunkRows(df: DataFrame, asId: String, idxName: String,
        vecName: String) =
      graft.sources.Tables.rebalanceForCompute(df)
        .select(col(idCol).as(asId), posexplode(expr(
          s"transform(sequence(0, ${chunks - 1}), " +
            s"c -> slice($vecCol, c * $clen + 1, $clen))"))
          .as(Seq(idxName, vecName)))
    val qc = chunkRows(queries, "query_id", "qc", "qv")
    val cc = chunkRows(corpus, "neighbor_id", "dc", "dv")
    val dots = cc.join(broadcast(qc), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qc"),
        round(VecOps.dot(col("qv"), col("dv")) * 1000000)
          .cast("long").as("dot_micro"))
    val best = dots.groupBy("query_id", "neighbor_id", "qc")
      .agg(max("dot_micro").as("m"))
    val scored = best.groupBy("query_id", "neighbor_id")
      .agg(sum("m").as("maxsim_micro"))
    rankTopK(scored, k, "maxsim_micro")
  }

  /** Deterministic pseudo-random unit component from a salt tuple,
    * folded into [-1, 1] — the ONE source of truth for both the LSH
    * hyperplanes and the IVF anchors (oracle parity depends on both
    * sides of each pair reading the same fold).
    */
  private def hashUnit(salt: Product): Float = {
    val h = scala.util.hashing.MurmurHash3.productHash(salt)
    (h.toDouble / Int.MaxValue).toFloat
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit,
    * dim). Planes are materialized as LITERAL float arrays so the
    * projection runs through the codegen'd `FloatVecDot` instead of an
    * interpreted zip_with/aggregate fold per (row, plane).
    */
  private def planeVal(table: Int, bit: Int, dim: Int): Float =
    hashUnit((table, bit, dim))

  /** The (table, bit) hyperplane as exact double values (floats widened) —
    * lets an external oracle reproduce `lshBucketKeys` bit-identically.
    */
  def planeValues(table: Int, bit: Int, dims: Int = 64): Array[Double] =
    (0 until dims).map(d => planeVal(table, bit, d).toDouble).toArray

  /** Namespace for the projection plane family — outside any LSH table
    * index (those are 0..tables-1), so reduction planes and bucket
    * planes never collide.
    */
  val ProjTable = 101

  /** Projection plane `j` as exact doubles, for oracle replay. */
  def projPlaneValues(j: Int, dims: Int = 64): Array[Double] =
    planeValues(ProjTable, j, dims)

  /** Johnson–Lindenstrauss-style random projection of an embedding to
    * `outDims` components: out_j = round(<vec, plane_j>, 6) with the
    * deterministic plane family above. A pure narrow map through the
    * codegen'd `FloatVecDot` — no shuffle, no fitted model to ship —
    * giving cheaper downstream ANN/clustering at 100 TB (JL: pairwise
    * distances are preserved within ε for outDims = O(log n / ε²));
    * `projPlaneValues` lets any SQL engine replay it bit-identically.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, dims: Int = 64): DataFrame =
    df.select(
      col(idCol) +: (0 until outDims).map { j =>
        val plane = typedlit((0 until dims).map(d => planeVal(ProjTable, j, d)).toArray)
        round(VecOps.dot(col(vecCol), plane), 6).as(s"p$j")
      }: _*)

  /** Random-hyperplane LSH bucket keys: for each of `tables` tables, a
    * `bits`-bit signature (sign of the projection on each plane).
    * `dims` must cover the embedding length (extra plane components are
    * ignored by the min-length dot product).
    */
  def lshBucketKeys(vec: Column, tables: Int, bits: Int, dims: Int = 64): Column = {
    require(tables < ProjTable,
      s"tables must stay below ProjTable=$ProjTable (plane namespaces would collide)")
    array((0 until tables).map { t =>
      val sig = (0 until bits).map { b =>
        val plane = typedlit((0 until dims).map(d => planeVal(t, b, d)).toArray)
        when(VecOps.dot(vec, plane) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
      concat_ws("_", lit(t), sig)
    }: _*)
  }

  /** LSH-bucketed near-neighbor pairs: candidates share ≥1 bucket in ≥1
    * table; verified with exact cosine. Same output contract as
    * `bruteForcePairs` minus LSH misses (tunable via tables/bits).
    */
  def lshNearDups(df0: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = 8): DataFrame = {
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(lshBucketKeys(col(vecCol), tables, bits)).as("bkey"))
    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bkey"))
    val cands = a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vA = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val vB = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    cands.join(vA, "id_a").join(vB, "id_b")
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic pseudo-random IVF anchor component for (cell, dim) —
    * the coarse quantizer of `ivfTopK`, reproducible by an external
    * oracle via `anchorValues`. Distinct hash domain from `planeVal`.
    */
  private def anchorVal(cell: Int, dim: Int): Float =
    hashUnit((cell, dim, 0x1f1f)) // distinct salt domain from planeVal

  /** The cell's anchor as exact double values (floats widened). */
  def anchorValues(cell: Int, dims: Int = 64): Array[Double] =
    (0 until dims).map(d => anchorVal(cell, d).toDouble).toArray

  /** Per-row array of dot products against all `cells` anchors (each a
    * codegen'd `FloatVecDot` against a literal float array).
    */
  private def anchorDots(vec: Column, cells: Int, dims: Int): Column =
    array((0 until cells).map { c =>
      val anchor = typedlit((0 until dims).map(d => anchorVal(c, d)).toArray)
      VecOps.dot(vec, anchor)
    }: _*)

  /** IVF-style ANN top-k with a FIXED coarse quantizer: `cells`
    * deterministic anchor vectors partition the space into argmax-dot
    * Voronoi cells; every corpus vector is assigned to its cell (1-based
    * `array_position` of the max dot — first index on ties), and each
    * query probes only its `nprobe` nearest cells (dot DESC, index ASC).
    * Candidates get exact cosine + top-k ranking, like `lshTopK`.
    *
    * Classic IVF trains the quantizer with k-means; fixed pseudo-random
    * anchors trade some cell balance for full determinism (the driver
    * oracle replays the anchors as literals) and zero training passes.
    * Scale: assignment is a narrow map over the corpus (`cells` codegen
    * dots/row), the probe join is an equality join on cell id, and cost
    * ∝ probed-cell occupancy — `cells` grows ~√n at corpus scale.
    */
  def ivfTopK(corpus0: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cells: Int = 16, nprobe: Int = 4,
      dims: Int = 64): DataFrame = {
    val corpus = graft.sources.Tables.rebalanceForCompute(corpus0)
    val ck = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("__ds", anchorDots(col("c_vec"), cells, dims))
      .withColumn("cell", array_position(col("__ds"), array_max(col("__ds"))))
      .drop("__ds")
    // nprobe nearest anchors: sort (−dot, idx) structs lexicographically
    // = dot DESC with idx ASC tie-break, 1-based to match array_position.
    val probes = slice(transform(
      array_sort(transform(sequence(lit(0), lit(cells - 1)),
        i => struct((element_at(col("__ds"), i + 1) * lit(-1.0)).as("negd"),
          (i + 1).as("idx")))),
      s => s.getField("idx")), 1, nprobe)
    val qk = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("__ds", anchorDots(col("q_vec"), cells, dims))
      .withColumn("cell", explode(probes))
      .drop("__ds")
    val scored = broadcast(qk).join(ck, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** IVF ANN with a TRAINED coarse quantizer: [[Kmeans.fit]] centroids
    * replace [[ivfTopK]]'s fixed pseudo-random anchors — the classic
    * train-then-serve IVF (k-means cells adapt to the corpus, so cell
    * occupancy is balanced where the data is, not where the hash
    * landed). Assignment/probing reuse the k-means fold (argmin
    * squared-L2, smallest-cid ties); candidate scoring is the exact
    * [[cosine]] like every other ANN variant here.
    *
    * Scale shape identical to [[ivfTopK]]: narrow assignment map over
    * the corpus (k folds/row against broadcast-literal centroids), the
    * probe join is an equality join on cell id, cost ∝ probed-cell
    * occupancy. Training adds [[Kmeans.fit]]'s iterations up front —
    * amortized over every query batch served from the index.
    */
  def ivfTrainedTopK(corpus0: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Seq[(Long, Array[Double])],
      nprobe: Int): DataFrame = {
    require(cents.nonEmpty && nprobe >= 1)
    val corpus = graft.sources.Tables.rebalanceForCompute(corpus0)
    def toD(c: Column) = transform(c, x => x.cast("double"))
    val ck = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      Kmeans.nearestCid(toD(col(vecCol)), cents).as("cell"))
    val qk = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      explode(Kmeans.nearestCids(toD(col(vecCol)), cents, nprobe)).as("cell"))
    val scored = broadcast(qk).join(ck, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** SemDeDup-style semantic near-dup pairs: candidates are pairs that
    * land in the SAME trained k-means cell ([[Kmeans.fit]] +
    * [[Kmeans.nearestCid]]), verified with exact [[cosine]]. The third
    * blocking scheme of the family — hyperplane buckets
    * ([[lshNearDups]]) block by random geometry, prefix/band keys block
    * by content, k-means cells block by the corpus's own density — and
    * the one the SemDeDup pipeline (Abbas et al. 2023) uses, where
    * near-dups are searched only within a cluster.
    *
    * Scale shape: assignment is a narrow map (k folds/row against
    * broadcast-literal centroids), candidates come from ONE equality
    * self-join on cell id — pair work is Σ |cell|², never n², and k
    * grows ~√n to keep cells bounded. Misses pairs straddling a cell
    * boundary (SemDeDup accepts exactly this trade).
    */
  def semanticNearDups(df0: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Array[Double])], threshold: Double): DataFrame = {
    require(cents.nonEmpty)
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    def toD(c: Column) = transform(c, x => x.cast("double"))
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Kmeans.nearestCid(toD(col(vecCol)), cents).as("cell"))
    val a = assigned.select(col("id").as("id_a"), col("v").as("v_a"),
      col("cell"))
    val b = assigned.select(col("id").as("id_b"), col("v").as("v_b"),
      col("cell"))
    a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Per-label element-wise centroids (mean-pooling — the k-means
    * assignment-step aggregate, and the "average the embeddings of a
    * group" primitive of retrieval pipelines).
    *
    * Output is EXPLODED — (label, pos, c, n), pos 1-based — so every
    * cell is a scalar an external oracle can hash.
    *
    * Determinism: float sums are order-dependent, and a distributed
    * aggregation cannot fix its addition order — so components are
    * summed in FIXED-POINT (floor(x·2^20) as long): integer addition is
    * associative-commutative, the partial aggregation stays map-side
    * combinable, and every engine computes the identical centroid. The
    * 2^-20 quantization (≈1e-6, below float32's own resolution near 1)
    * is the documented price.
    *
    * Scale shape: posexplode (narrow) → ONE shuffle of (label, pos)
    * partial sums. dims × labels cells regardless of corpus size.
    */
  def centroids(df0: DataFrame, labelCol: String, vecCol: String,
      scaleBits: Int = 20): DataFrame = {
    val q = (1L << scaleBits).toDouble
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
        floor(col("x").cast("double") * lit(q)).cast("long").as("fx"))
      .groupBy("label", "pos")
      .agg(sum("fx").as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round((col("s").cast("double") / col("n")) / lit(q), 6).as("c"),
        col("n"))
  }

  /** Symmetric int8 quantization of a float-vector column: codes are
    * round-half-up(x / scale) with scale = max|x| / 127, so values span
    * [-127, 127]. Returned as (codes FLOAT array, scale) — float-typed
    * codes keep the dot product on the codegen'd `FloatVecDot` path
    * (int8 magnitudes are exact in float32, so nothing is lost).
    *
    * At 100 TB this is the storage/bandwidth lever for ANN: 4× smaller
    * vectors, integer-exact dot products (every engine computes the
    * identical score — no float-summation ordering concerns), and on
    * real hardware the int8 SIMD path. A zero vector quantizes to all
    * zeros (scale 0 guard).
    */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val scale = array_max(transform(vec, x => abs(x))).cast("double") / lit(127.0)
    val codes = transform(vec, x =>
      when(scale === 0, lit(0.0))
        .otherwise(floor(x.cast("double") / scale + lit(0.5)).cast("double")))
      .cast("array<float>")
    (codes, scale)
  }

  /** ANN top-k over int8-quantized vectors: rank by the integer dot
    * product of the codes (monotone proxy for cosine when vectors are
    * similarly scaled). Same broadcast-queries/scan-corpus shape as
    * `bruteForceTopK`; the scored column is the exact integer `qdot`.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val (qCodes, _) = quantizeInt8(col(vecCol))
    val q = broadcast(queries.select(col(idCol).as("query_id"), qCodes.as("q_q")))
    val c = graft.sources.Tables.rebalanceForCompute(
      corpus.select(col(idCol).as("neighbor_id"), qCodes.as("c_q")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      // Products ≤ 127² and ≤ a few thousand dims: integer-exact in the
      // double accumulator, so the cast back to long is lossless.
      .withColumn("qdot", VecOps.dot(col("q_q"), col("c_q")).cast("long"))
      .select("query_id", "neighbor_id", "qdot")
    rankTopK(scored, k, scoreCol = "qdot")
  }

  /** LSH-bucketed top-k: query vectors probe their own buckets only, then
    * rank within candidates. The scale path for ANN search: cost is
    * proportional to bucket occupancy, not corpus size.
    */
  def lshTopK(corpus0: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, bits: Int = 8): DataFrame = {
    val corpus = graft.sources.Tables.rebalanceForCompute(corpus0)
    val ck = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      explode(lshBucketKeys(col(vecCol), tables, bits)).as("bkey"))
    val qk = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(lshBucketKeys(col(vecCol), tables, bits)).as("bkey"))
    val cands = broadcast(qk).join(ck, Seq("bkey"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_vec", "neighbor_id", "c_vec").distinct()
    val scored = cands
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  /** Cosine of every vector to its own label's centroid — the
    * embedding-space outlier diagnostic (mislabeled / off-distribution
    * documents sit far from their cluster's mean). Everything runs in
    * fixed-point integers: vectors quantize to `floor(x·2^scaleBits)`,
    * the centroid is the UN-normalized integer component-sum (cosine is
    * scale-invariant, so dividing by n is unnecessary — and skipping it
    * keeps the arithmetic exact), and the final cosine is assembled in
    * doubles from three exact int64 sums, identical in every engine.
    *
    * Scale shape: centroids are one partial-aggregated (label, pos) sum
    * — a labels×dims table — collected into per-label arrays and
    * `broadcast()` back onto a single corpus scan; no corpus shuffle.
    * The per-row fold over the quantized arrays is a higher-order
    * function (interpreted): at real scale swap it for a codegen'd
    * long-vector dot (the `FloatVecDot` pattern); int64 headroom at
    * scaleBits=16 covers |x|≤1, dims≤256, ≤2^26 rows per label.
    */
  def centroidCosine(df0: DataFrame, labelCol: String, idCol: String,
      vecCol: String, scaleBits: Int = 16): DataFrame = {
    val q = (1L << scaleBits).toDouble
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    val fx = transform(col(vecCol),
      x => floor(x.cast("double") * lit(q)).cast("long"))
    val v = df.select(col(idCol).as("id"), col(labelCol).as("label"),
      fx.as("fv"))
    val cent = v
      .select(col("label"), posexplode(col("fv")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("s"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          e => e.getField("s")).as("cv"),
        sum(col("s") * col("s")).as("nb"))
    v.join(broadcast(cent), Seq("label"))
      .select(col("id"), col("label"),
        aggregate(zip_with(col("fv"), col("cv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"),
        aggregate(col("fv"), lit(0L), (acc, x) => acc + x * x).as("na"),
        col("nb"))
      .select(col("id"), col("label"),
        when(col("na") > 0 && col("nb") > 0,
          round(col("dot") / (sqrt(col("na").cast("double")) *
            sqrt(col("nb").cast("double"))), 6)).as("cos_centroid"))
  }
}
