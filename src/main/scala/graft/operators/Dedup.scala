package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.VecOps
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

  /** MinHash+LSH near-duplicate pairs over a text column.
    *
    * shingle → minhash signature → band → bucket-join → exact-Jaccard
    * verify. Output: (id_a, id_b, jaccard) for pairs with similarity ≥
    * `threshold`. With b bands of r rows, a pair of true similarity j is
    * caught with probability 1-(1-j^r)^b (≈1 for j≥0.8 at b=16,r=2).
    *
    * Physical shape: signatures are computed by exploding shingles and
    * taking `numHashes` codegen'd min-aggregates in ONE shuffle — not by
    * `numHashes` interpreted array transforms per row (higher-order
    * functions don't codegen; at sf0.1 that difference is 65 s → ~8 s).
    * The verification Jaccard runs on hashed-long shingle sets, which
    * compare ~5× faster than strings (64-bit collisions are negligible
    * at any realistic corpus size).
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.5): DataFrame =
    minhashNearDupsCached(df, idCol, textCol, shingleLen, numHashes, bands,
      threshold)._1

  /** As `minhashNearDups`, also returning the persisted shingle table so a
    * caller that MATERIALIZES the result (e.g. `Clusters.dedupClusters`)
    * can unpersist it afterwards. Callers returning the lazy result leave
    * the cache to LRU eviction / session teardown (there is no safe
    * unpersist point before the consumer runs the query).
    */
  private[operators] def minhashNearDupsCached(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.5): (DataFrame, DataFrame) = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    // Persisted: the plan reuses the shingle table three times (signature
    // explode + both verification sides); recomputing the interpreted
    // shingling per use triples the operator's cost.
    val base = shingleTable(df, idCol, textCol, shingleLen)
    val keyed = bandKeyed(base, numHashes, bands)

    // Same verification machinery as ngramJaccardNearDups.
    (verifyPairs(pairStream(keyed), base, threshold), base)
  }

  /** Incremental near-dup detection: flag documents of a NEW batch that
    * near-duplicate an EXISTING corpus — the shape a production ingest
    * actually runs (re-pairing the whole corpus per batch is O(corpus²)
    * wasted work; only new × corpus pairs matter). Same shingle →
    * signature → band machinery as [[minhashNearDups]], but the
    * candidate join is ASYMMETRIC: new-batch band keys against corpus
    * band keys, so cost scales with |new| × band-collision rate, never
    * with corpus pair space. Output: (`idCol`, dup_of, jaccard) for
    * each new document near-duplicating a corpus document at ≥
    * `threshold`.
    */
  def minhashIncremental(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, shingleLen: Int = 3,
      numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val newBase = shingleTable(newDf, idCol, textCol, shingleLen)
    val oldBase = shingleTable(corpusDf, idCol, textCol, shingleLen)
    val pairs = bandKeyed(newBase, numHashes, bands)
      .select(col("id").as("id_a"), col("bkey"))
      .join(bandKeyed(oldBase, numHashes, bands)
        .select(col("id").as("id_b"), col("bkey")), Seq("bkey"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
    verifyPairsTwoSided(pairs, newBase, oldBase, threshold)
      .select(col("id_a").as(idCol), col("id_b").as("dup_of"), col("jaccard"))
  }

  /** (id, bkey) band-key stream: one explode + one shuffle computes all
    * `numHashes` signature positions, then bands of `numHashes/bands`
    * rows concatenate into string keys.
    */
  private def bandKeyed(base: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    // One codegen'd pass over each document's shingle array computes the
    // whole signature ([[graft.expressions.MinHashSig]]) — no shingle
    // explode, no groupBy exchange; signatures and band keys stay
    // bit-identical to the aggregation formulation they replaced.
    // Shingle-less documents (which the old explode dropped implicitly)
    // are filtered: they can never pair.
    val sigs = base.where(size(col("hs")) > 0)
      .select(col("id"),
        graft.expressions.MinHashSig.signature(col("hs"), numHashes).as("sig"))
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("_", (lit(b) +: (0 until rows).map(i =>
        element_at(col("sig"), b * rows + i + 1))): _*)
    }: _*)
    sigs.select(col("id"), explode(bandKeys).as("bkey"))
  }

  /** Persisted (id, sorted distinct xxhash64-shingle array) table — the
    * shared input of signature generation and pair verification.
    */
  private def shingleTable(df0: DataFrame, idCol: String, textCol: String,
      shingleLen: Int): DataFrame = {
    // Shingling is the CPU-heavy narrow stage; don't let a few-row-group
    // input serialize it (no-op on well-partitioned inputs).
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    // tokens materialized BEFORE shingling: HOF lambda children are not
    // CSE'd, so wordShingles over a raw tokens(text) expression would
    // re-run the regex tokenizer once per gram — O(tokens²) per document
    // (the winnowing trap; harmless on short fixtures, quadratic on
    // real long documents)
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(
        col("id"),
        TextOps.wordShingles(col("__t"), shingleLen).as("sh"))
      // NULL text → empty set, not a null array: null-text docs then flow
      // through signature/verify plumbing as ordinary no-shingle rows
      // (they can never pair) instead of nulling out downstream exprs.
      .withColumn("hs", coalesce(
        array_sort(transform(col("sh"), s => xxhash64(s))),
        array().cast("array<bigint>")))
      .select("id", "hs")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact n-gram Jaccard near-dup pairs via PREFIX FILTERING (SSJoin /
    * AllPairs family — public algorithm): under any global total order of
    * shingles, two sets with Jaccard ≥ t must share at least one element
    * among each set's first `⌊(1-t)·|S|⌋ + 1` elements. Candidates are
    * pairs sharing a prefix element — an equality join, no misses, no
    * O(n²) pair space.
    *
    * The global order is (document-frequency ASC, hash) — rarest-first.
    * This is the standard AllPairs refinement: prefixes then hold each
    * document's RAREST shingles, so popular shingles (which would pair
    * everything with everything in a small-vocabulary corpus) never become
    * join keys. Any fixed total order preserves exactness; frequency order
    * just minimizes candidates. Candidate verification is the early-exit
    * thresholded merge scan in `verifyPairs` (the size-ratio implication
    * of J ≥ t is enforced there by the scan's reachability bound).
    *
    * Measured and REJECTED (examples/ProfileNgram3, sf0.1): the PPJoin
    * positional filter prunes the occurrence stream 12.8M → 3.5M, yet
    * slows the operator ~2× end to end — the early-exit scan already
    * aborts hopeless pairs on its first bound check (same arithmetic as
    * the positional predicate), and threading pos/size columns through
    * the join costs more than the pruned scans saved.
    */
  def ngramJaccardNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 2, threshold: Double = 0.6): DataFrame = {
    val base = shingleTable(df, idCol, textCol, shingleLen)

    // Global rarest-first order: df(shingle) ASC, hash as tie-break. Any
    // fixed total order preserves exactness; rarest-first minimizes how
    // often popular shingles become join keys.
    val ex = base.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    val prefLen = (floor(size(col("ord")) * lit(1.0 - threshold)) + 1).cast("int")
    val keyed = ordered.select(col("id"),
      explode(transform(slice(col("ord"), lit(1), prefLen),
        s => s.getField("h"))).as("bkey"))

    verifyPairs(pairStream(keyed), base, threshold)
  }

  /** Candidate (id_a, id_b) pair stream from an equality blocking key —
    * NOT deduplicated; dedup happens on the (tiny) verified output.
    */
  private def pairStream(keyed: DataFrame): DataFrame = {
    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bkey"))
    a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Exact-Jaccard verification of a candidate pair stream against the
    * (id, sorted-hash-set) table.
    *
    * Plan shape: pairs ⋈ sets ⋈ sets with a codegen'd EARLY-EXIT merge
    * scan (`SortedLongJaccardGE`) — the whole verification is one
    * whole-stage-codegen span: join probe, thresholded merge scan,
    * filter. No UDF boundary, no per-pair boxing, no driver-side
    * collect. Inside codegen the broadcast-side array is read in place
    * from the hashed relation, so candidate rows never copy the arrays.
    *
    * The candidate stream is verified PER OCCURRENCE (a pair sharing k
    * prefix elements is scanned k times) — measured at sf0.1 this beats
    * a pre-verification `distinct` by ~10×: deduplicating 12.8M narrow
    * rows costs a full shuffle + hash-agg, while re-scanning (mean
    * multiplicity 1.8, early-exit abort after ~¼ of the merge) is almost
    * free. The `distinct` on the (tiny) verified output keeps the result
    * set-correct.
    *
    * Small corpus (fits executor memory): both set sides get an explicit
    * `broadcast()` hint — candidates never shuffle. This is the regime
    * where blocking degenerates (small shingle universe → many
    * candidates), so the per-pair cost must be nanoseconds. Large corpus:
    * shingle universes grow with the corpus, blocking is selective,
    * candidates are few — the shuffled join carrying arrays to the
    * (small) candidate set is the right plan.
    *
    * The size-ratio prune (J ≥ t ⟹ min/max ≥ t) is subsumed by the
    * early-exit bound: a size-ratio-failing pair aborts on the scan's
    * first bound check (c=0, min(|A|,|B|) < required), before any
    * element comparison.
    */
  private def verifyPairs(pairs: DataFrame, base: DataFrame,
      threshold: Double, broadcastLimit: Long = 100000): DataFrame =
    verifyPairsTwoSided(pairs, base, base, threshold, broadcastLimit)

  /** As [[verifyPairs]] but with distinct A/B set tables (incremental
    * dedup verifies new-batch rows against corpus rows). Each side gets
    * its own broadcast decision — in the incremental case the new batch
    * is typically tiny and broadcasts even when the corpus cannot.
    */
  private def verifyPairsTwoSided(pairs: DataFrame, baseA: DataFrame,
      baseB: DataFrame, threshold: Double,
      broadcastLimit: Long = 100000): DataFrame = {
    // The count() is an eager hint-selection action, but it runs on the
    // already-persisted shingle table the verification needs anyway. The
    // limit is rows, sized so worst-case broadcast arrays (~200 hashes ×
    // 8 B × limit ≈ 160 MB) fit executor memory; beyond it the shuffled
    // join (linear in candidates) takes over.
    def hint(base: DataFrame): DataFrame => DataFrame =
      if (base.count() <= broadcastLimit) broadcast else identity
    val hintA = hint(baseA)
    val hintB = if (baseB eq baseA) hintA else hint(baseB) // one count, not two
    val shA = hintA(baseA.select(col("id").as("id_a"), col("hs").as("hs_a")))
    val shB = hintB(baseB.select(col("id").as("id_b"), col("hs").as("hs_b")))
    pairs.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        VecOps.sortedJaccardGE(col("hs_a"), col("hs_b"), threshold))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .distinct()
  }

  /** Asymmetric CONTAINMENT near-dups: ordered pairs where document A's
    * shingle set is mostly inside B's — `|A∩B| / |A| ≥ t` — the
    * snippet/quote/boilerplate detector symmetric Jaccard misses (a
    * tweet quoted inside an article scores near-zero Jaccard but
    * containment ≈ 1). Directed: (id_a, id_b) means A inside B; both
    * directions are evaluated.
    *
    * Prefix filter, containment form: if |A∩B| ≥ t·|A| then among A's
    * first ⌊(1−t)·|A|⌋+1 shingles under the global rarest-first order at
    * least one is in B (else too many of A's elements are missing) — so
    * candidates come from A-prefix × B-full equality join on the
    * shingle, the same discipline as [[ngramJaccardNearDups]] with the
    * prefix on the contained side only. Verification is the codegen'd
    * sorted-set intersect count + an exact integer test
    * (`1000·c ≥ ⌈1000·t⌉·|A|` — no float division).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 2, threshold: Double = 0.8,
      broadcastLimit: Long = 100000): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    val t1000 = math.ceil(threshold * 1000).toLong
    val base = shingleTable(df, idCol, textCol, shingleLen)
    val ex = base.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    val prefLen = (floor(size(col("ord")) * lit(1.0 - threshold)) + 1)
      .cast("int")
    val aKeys = ordered.select(col("id").as("id_a"),
      explode(transform(slice(col("ord"), lit(1), prefLen),
        s => s.getField("h"))).as("h"))
    val bKeys = ex.select(col("id").as("id_b"), col("h"))
    val pairs = aKeys.join(bKeys, Seq("h"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
    val hint: DataFrame => DataFrame =
      if (base.count() <= broadcastLimit) broadcast else identity
    val shA = hint(base.select(col("id").as("id_a"), col("hs").as("hs_a")))
    val shB = hint(base.select(col("id").as("id_b"), col("hs").as("hs_b")))
    pairs.join(shA, "id_a").join(shB, "id_b")
      .withColumn("c",
        graft.expressions.VecOps.sortedIntersectCount(
          col("hs_a"), col("hs_b")).cast("long"))
      .where(col("c") * 1000 >= lit(t1000) * size(col("hs_a")) &&
        size(col("hs_a")) > 0)
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / size(col("hs_a")), 6)
          .as("containment"))
      .distinct()
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

  /** SimHash signatures for a whole table computed with ONE explode + ONE
    * shuffle: tokens explode to rows, each token hashed once, then 64
    * codegen'd conditional sums per doc replace 64 interpreted array folds
    * per row (the `simhash64` expression form). Bit-identical votes.
    *
    * `tokenHash` is the per-token 64-bit hash: xxhash64 (default, fast
    * path) or `TextOps.md5Hash60` (oracle-checkable in DuckDB; its top 4
    * bits are constant, which leaves Hamming distances intact).
    */
  def simhashSignatures(df0: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val df = graft.sources.Tables.rebalanceForCompute(df0)
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("t"))
      .withColumn("h", tokenHash(col("t")))
    val votes = toks.groupBy("id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(lit(1L)) * 2 - 1).as("v0"),
      (1 until 64).map(i =>
        sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$i")): _*)
    val sim = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("id"), sim.as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist` (≤ 3 for the
    * default 4 chunks — pigeonhole: 3 flipped bits leave at least one
    * 16-bit chunk identical, so the chunk equality join is complete).
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, chunks: Int = 4,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxDist < chunks, "pigeonhole completeness needs maxDist < chunks")
    val bitsPer = 64 / chunks
    val mask = (1L << bitsPer) - 1
    val base = simhashSignatures(df, idCol, textCol, tokenHash)

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
