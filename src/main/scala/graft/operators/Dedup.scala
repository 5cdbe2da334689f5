package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for 100 TB-scale training-data pipelines.
  *
  * Four families, in decreasing exactness / increasing scale-friendliness:
  *   - exact: hash-groupBy on a normalization key (one shuffle);
  *   - n-gram Jaccard: exact set similarity over size-blocked candidates;
  *   - MinHash + LSH banding: sub-quadratic candidate generation, then
  *     exact Jaccard verification (false positives die, misses are bounded
  *     by the band/row choice);
  *   - SimHash: 64-bit sketch + pigeonhole chunk join — complete for small
  *     Hamming radii.
  *
  * Scale design: no operator here ever materializes the O(n²) pair space.
  * Candidates always come from an equality join on a blocking key (band,
  * size bucket, or sketch chunk), so Spark executes them as shuffled hash
  * joins that partition by key. Shingle arrays are carried only to the
  * verification join, never through the candidate explosion.
  */
object Dedup {

  /** Exact dedup by key: one representative (min id) per group plus the
    * duplicate count. A single hash-shuffle; with AQE, skewed keys split.
    */
  def exactByKey(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Candidate pairs from an equality blocking key: explode (id, key),
    * self-join on key, dedup (a<b) pairs. Only ids travel through the
    * join; payload is re-attached by the caller.
    */
  private def candidatesByKey(keyed: DataFrame): DataFrame = {
    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bkey"))
    a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set. Pure codegen'd expressions.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingleSet, s => xxhash64(s, lit(k))))
    }: _*)

  /** LSH band keys: signature split into `bands` bands of `rows` values,
    * each band hashed with its index into one string key.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_", (lit(b) +: (0 until rows).map(i =>
        element_at(sig, b * rows + i + 1))): _*)
    }: _*)

  /** MinHash+LSH near-duplicate pairs over a text column.
    *
    * shingle → minhash signature → band → bucket-join → exact-Jaccard
    * verify. Output: (id_a, id_b, jaccard) for pairs with similarity ≥
    * `threshold`. With b bands of r rows, a pair of true similarity j is
    * caught with probability 1-(1-j^r)^b (≈1 for j≥0.8 at b=16,r=2).
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val base = df.select(
      col(idCol).as("id"),
      TextOps.wordShingles(TextOps.tokens(col(textCol)), shingleLen).as("sh"))

    val keyed = base
      .withColumn("bkey",
        explode(lshBandKeys(minhashSignature(col("sh"), numHashes), bands, rows)))
      .select("id", "bkey")

    val cands = candidatesByKey(keyed)
    val shA = base.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = base.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cands.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard near-dup pairs with size blocking (no LSH, no
    * misses): a pair with Jaccard ≥ t must have distinct-set sizes within
    * a factor 1/t, so candidates are restricted to pairs whose log-sized
    * buckets are adjacent. Blocking is an equality join on bucket id (the
    * smaller side probes its own and the next bucket), so qualifying pairs
    * are never lost and the pair space stays near-linear for t close to 1.
    */
  def ngramJaccardNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 2, threshold: Double = 0.6): DataFrame = {
    val logBase = math.log(1.0 / threshold)
    val base = df.select(
      col(idCol).as("id"),
      TextOps.wordShingles(TextOps.tokens(col(textCol)), shingleLen).as("sh"))
      .withColumn("bucket",
        floor(log(size(col("sh")).cast("double")) / logBase).cast("long"))

    // Every doc lands in its own bucket; it additionally probes bucket+1 so
    // adjacent-bucket pairs meet exactly once (from the smaller side).
    val keyed = base.select(col("id"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bkey"))
    val cands = candidatesByKey(keyed)

    val shA = base.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = base.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cands.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of a token array: bit i is set when the sum over
    * tokens of ±1 (sign of bit i of the token's xxhash64) is positive.
    */
  def simhash64(toks: Column): Column =
    (0 until 64).map { i =>
      val vote = aggregate(toks, lit(0L),
        (acc, t) => acc + (shiftright(xxhash64(t), i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist` (≤ 3 for the
    * default 4 chunks — pigeonhole: 3 flipped bits leave at least one
    * 16-bit chunk identical, so the chunk equality join is complete).
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, chunks: Int = 4): DataFrame = {
    require(maxDist < chunks, "pigeonhole completeness needs maxDist < chunks")
    val bitsPer = 64 / chunks
    val mask = (1L << bitsPer) - 1
    val base = df.select(col(idCol).as("id"),
      simhash64(TextOps.tokens(col(textCol))).as("sim"))

    val keyed = base.select(col("id"), col("sim"),
      explode(array((0 until chunks).map(c =>
        concat_ws("_", lit(c),
          shiftright(col("sim"), c * bitsPer).bitwiseAND(lit(mask)))): _*)).as("bkey"))

    val a = keyed.select(col("id").as("id_a"), col("sim").as("sim_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("sim").as("sim_b"), col("bkey"))
    a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
