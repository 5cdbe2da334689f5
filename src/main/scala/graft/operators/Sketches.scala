package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Mergeable cardinality / frequency sketches — the 100 TB answer to
  * "how many distinct X" and "how often does Y occur" when an exact
  * `COUNT(DISTINCT)` shuffle or a full frequency table is too big.
  *
  * All three sketches here are DETERMINISTIC given the hash function:
  * KMV (k-minimum-values, Bar-Yossef et al. 2002), HyperLogLog
  * registers (Flajolet et al. 2007, raw estimator without the
  * stochastic-averaging bias table), and Count-Min (Cormode &
  * Muthukrishnan 2005). Determinism is the point: with the pluggable
  * `TextOps.md5Hash60` hash the whole sketch — registers, not just the
  * final estimate — replays in ANSI SQL, so the driver oracle checks
  * the sketch math itself. Production callers swap in `xxhash64` for
  * speed; the algorithms are hash-agnostic.
  *
  * Scale shape: every sketch is one narrow hash map + ONE partial
  * aggregation (Spark's map-side combine makes the shuffle carry at
  * most `m`/`k`/`depth × width` rows per partition, not data rows).
  * All sketches are mergeable by construction (min/max/sum), which is
  * what makes them partition-parallel.
  */
object Sketches {

  /** Normalizing constant for a `bits`-bit non-negative hash. */
  private def domain(bits: Int): Double = math.pow(2.0, bits)

  /** KMV distinct-count estimate: keep the k smallest DISTINCT hash
    * values; with u = (k-th smallest + 1) / 2^bits (the hash domain
    * normalized to (0,1]), estimate (k-1)/u. When fewer than k distinct
    * hashes exist the sketch is exact and returns that count.
    *
    * One row out: (k, n_exact, kmv_est). `n_exact` is carried for
    * error inspection — on a real corpus you'd skip it (it is the very
    * shuffle the sketch avoids).
    *
    * Plan: hash+distinct is one partial-agg shuffle; the k smallest
    * arrive via TakeOrdered (per-partition top-k, no global sort).
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 64,
      hashFn: Column => Column = TextOps.md5Hash60, hashBits: Int = 60): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // Hash the decimal-string form: engine-portable (an oracle replays
    // md5(key::VARCHAR)), and identical for any key type. The hash map
    // is the CPU-heavy narrow stage — don't let a few-row-group input
    // serialize it (no-op on well-partitioned inputs).
    val dfc = graft.sources.Tables.rebalanceForCompute(df)
    val kth = dfc.select(hashFn(col(keyCol).cast("string")).as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_in_k"), max(col("h")).as("h_k"))
    val exact = df.agg(countDistinct(col(keyCol)).as("n_exact"))
    exact.crossJoin(kth).select(
      lit(k).as("k"),
      col("n_exact"),
      when(col("n_in_k") < k, col("n_in_k").cast("double"))
        .otherwise(round(
          lit(k - 1.0) / ((col("h_k") + 1).cast("double") / lit(domain(hashBits))),
          4)).as("kmv_est"))
  }

  /** KMV set algebra (Beyer et al., SIGMOD'07 "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations"): estimate
    * |A∪B|, Jaccard(A,B), and |A∩B| between two keyed frames from their
    * k-min-value sketches alone — the "how much do these two sources
    * overlap" question (shared users, shared vocabulary, shared URLs)
    * answered WITHOUT a distinct-join of the full sets.
    *
    * Combined sketch = k smallest distinct hashes of A's ∪ B's sketch
    * hash sets; with u = (k-th + 1)/2^bits: union_est = (k−1)/u.
    * ρ = |{h ∈ combined : h ∈ sketch(A) ∧ h ∈ sketch(B)}| / k is an
    * unbiased Jaccard estimator, and intersect_est = ρ · union_est.
    *
    * Everything after the two per-side sketch builds (each one
    * hash+distinct partial-agg shuffle + TakeOrdered, exactly
    * [[kmvDistinct]]'s plan) happens on ≤ 2k-row frames — at 100 TB the
    * scans dominate and the sketch algebra is free. Hashes are exact
    * integers; the two final divisions are single double ops both
    * engines reproduce bit-identically.
    *
    * One row out: (k, union_est, jaccard_est, intersect_est).
    */
  def kmvSetOps(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      k: Int = 64, hashFn: Column => Column = TextOps.md5Hash60,
      hashBits: Int = 60): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    def sketch(df: DataFrame, keyCol: String): DataFrame =
      graft.sources.Tables.rebalanceForCompute(df)
        .select(hashFn(col(keyCol).cast("string")).as("h")).distinct()
        .orderBy("h").limit(k)
    val sa = sketch(a, aKey).withColumn("in_a", lit(1L))
    val sb = sketch(b, bKey).withColumn("in_b", lit(1L))
    // Combined k smallest over the union of the two sketches (≤ 2k rows).
    val combined = sa.select("h").union(sb.select("h")).distinct()
      .orderBy("h").limit(k)
    val flagged = combined
      .join(sa, Seq("h"), "left").join(sb, Seq("h"), "left")
    val agg = flagged.agg(
      count(lit(1)).as("n_in_k"),
      max(col("h")).as("h_k"),
      sum(coalesce(col("in_a"), lit(0L)) * coalesce(col("in_b"), lit(0L)))
        .as("n_both"))
    agg.select(
      lit(k).as("k"),
      // Short side exact when the union fits inside k (sketch == set).
      when(col("n_in_k") < k, col("n_in_k").cast("double"))
        .otherwise(round(
          lit(k - 1.0) / ((col("h_k") + 1).cast("double") / lit(domain(hashBits))),
          4)).as("union_est"),
      round(col("n_both").cast("double") / col("n_in_k"), 6).as("jaccard_est"))
      .withColumn("intersect_est", round(col("union_est") * col("jaccard_est"), 4))
  }

  /** HyperLogLog distinct-count estimate with m registers (power of 2).
    *
    * bucket = h mod m; payload = h >> log2(m) (so bucket and payload
    * bits are independent); rho = 1 + leading zeros of the payload
    * within its (hashBits - log2(m))-bit window = payloadBits + 1 -
    * bitlength(payload). Register j keeps max rho. The raw HLL
    * estimator alpha_m * m² / Σ 2^-M_j is computed EXACTLY: each term
    * 2^(payloadBits+1-M_j) is an integer, so the harmonic sum is a
    * BIGINT — no float-summation order dependence, and the single
    * final division is reproducible in any engine.
    *
    * One row out: (m, n_exact, hll_est). Accuracy ~1.04/√m relative.
    * Range guard: the raw estimator needs n ≳ 2.5m (below that HLL
    * switches to linear counting, whose `ln` is libm-dependent and
    * NOT bit-reproducible across engines — this method targets the
    * large-cardinality regime a sketch exists for, and `kmvDistinct`
    * covers small counts exactly).
    */
  /** HLL register table (bucket, r) of `df[keyCol]` — the mergeable
    * sketch state shared by [[hllDistinct]] and [[hllUnion]].
    */
  private def hllRegisters(df: DataFrame, keyCol: String, m: Int,
      hashFn: Column => Column, bucketBits: Int, payloadBits: Int): DataFrame = {
    // Rebalance ahead of the hash map (same reason as kmvDistinct).
    val h = graft.sources.Tables.rebalanceForCompute(df)
      .select(hashFn(col(keyCol).cast("string")).as("h"))
      .select(pmod(col("h"), lit(m)).as("bucket"),
        // Unsigned shift: md5Hash60 is non-negative (no difference), but
        // a production xxhash64 hash is signed and must not sign-extend.
        shiftrightunsigned(col("h"), bucketBits).as("w"))
    val rho = when(col("w") === 0, lit(payloadBits + 1))
      .otherwise(lit(payloadBits + 1) - length(bin(col("w"))))
    h.select(col("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("r"))
  }

  /** 1-row frame: exact-integer harmonic sum of a register table.
    * Σ 2^(payloadBits+1-r) over present registers + 2^(payloadBits+1)
    * per EMPTY register (M_j = 0) — exact integer arithmetic.
    */
  private def hllHarm(regs: DataFrame, m: Int, payloadBits: Int,
      as: String): DataFrame =
    regs.agg(
      // shiftleft's Scala binding takes a literal shift; the SQL form
      // accepts a column one.
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${payloadBits + 1} - r)")).as("s"),
      count(lit(1)).as("nregs"))
      .select((col("s") +
        (lit(m) - col("nregs")) * lit(1L << (payloadBits + 1))).as(as))

  def hllDistinct(df: DataFrame, keyCol: String, m: Int = 64,
      hashFn: Column => Column = TextOps.md5Hash60, hashBits: Int = 60): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of 2, >= 16")
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(m)
    val payloadBits = hashBits - bucketBits
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // alpha * m^2 * 2^payloadBits — the numerator of the exact-sum form.
    val numerator = alpha * m.toDouble * m.toDouble * domain(payloadBits)
    val regs = hllRegisters(df, keyCol, m, hashFn, bucketBits, payloadBits)
    val summed = hllHarm(regs, m, payloadBits, "harm")
    val exact = df.agg(countDistinct(col(keyCol)).as("n_exact"))
    exact.crossJoin(summed).select(
      lit(m).as("m"),
      col("n_exact"),
      // numerator carries the +1 exponent shift of the harm terms: the
      // classic Σ2^-M equals harm / 2^(payloadBits+1).
      round(lit(numerator * 2.0) / col("harm").cast("double"), 3).as("hll_est"))
  }

  /** HLL UNION — the mergeability that justifies sketches at 100 TB:
    * register-wise max of two sides' register tables IS the sketch of
    * the union (each register keeps the max rho any union element
    * produces), so per-shard/per-day sketches roll up without
    * re-touching the data. Returns per-side and merged estimates in
    * one row: (m, est_a, est_b, union_est). All three run the same
    * exact-integer harmonic sum as [[hllDistinct]]; the merge itself
    * is a full-outer join of two ≤ m-row register tables — free.
    */
  def hllUnion(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      m: Int = 64, hashFn: Column => Column = TextOps.md5Hash60,
      hashBits: Int = 60): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of 2, >= 16")
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(m)
    val payloadBits = hashBits - bucketBits
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val numerator = alpha * m.toDouble * m.toDouble * domain(payloadBits)
    val ra = hllRegisters(a, aKey, m, hashFn, bucketBits, payloadBits)
    val rb = hllRegisters(b, bKey, m, hashFn, bucketBits, payloadBits)
    // Register-wise max; an absent register is 0 on that side.
    val merged = ra.select(col("bucket"), col("r").as("r_a"))
      .join(rb.select(col("bucket"), col("r").as("r_b")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        greatest(coalesce(col("r_a"), lit(0L)),
          coalesce(col("r_b"), lit(0L))).as("r"))
    def est(harm: Column): Column =
      round(lit(numerator * 2.0) / harm.cast("double"), 3)
    hllHarm(ra, m, payloadBits, "ha")
      .crossJoin(hllHarm(rb, m, payloadBits, "hb"))
      .crossJoin(hllHarm(merged, m, payloadBits, "hu"))
      .select(lit(m).as("m"), est(col("ha")).as("est_a"),
        est(col("hb")).as("est_b"), est(col("hu")).as("union_est"))
  }

  /** Per-group HLL distinct estimates — the GROUP BY form of
    * [[hllDistinct]] (per-source distinct users, per-shard distinct
    * keys). Registers shuffle once keyed by (group, bucket) — at most
    * `groups × m` rows into the fold, regardless of input size — then
    * one group-level exact-integer harmonic sum. Identical register
    * math to the global form, so the same oracle replay applies with a
    * GROUP BY added.
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, keyCol: String,
      m: Int = 64, hashFn: Column => Column = TextOps.md5Hash60,
      hashBits: Int = 60): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of 2, >= 16")
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(m)
    val payloadBits = hashBits - bucketBits
    val numerator = hllNumerator(m, hashBits)
    val h = graft.sources.Tables.rebalanceForCompute(df)
      .select(col(groupCol), hashFn(col(keyCol).cast("string")).as("h"))
      .select(col(groupCol), pmod(col("h"), lit(m)).as("bucket"),
        shiftrightunsigned(col("h"), bucketBits).as("w"))
    val rho = when(col("w") === 0, lit(payloadBits + 1))
      .otherwise(lit(payloadBits + 1) - length(bin(col("w"))))
    val regs = h.select(col(groupCol), col("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket")).agg(max(col("rho")).as("r"))
    val summed = regs.groupBy(col(groupCol)).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${payloadBits + 1} - r)")).as("s"),
      count(lit(1)).as("nregs"))
      .select(col(groupCol), (col("s") +
        (lit(m) - col("nregs")) * lit(1L << (payloadBits + 1))).as("harm"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
    exact.join(summed, groupCol).select(
      col(groupCol), lit(m).as("m"), col("n_exact"),
      round(lit(numerator) / col("harm").cast("double"), 3).as("hll_est"))
  }

  /** Exact double numerator of the HLL estimate, for oracle replay. */
  def hllNumerator(m: Int, hashBits: Int = 60): Double = {
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(m)
    val payloadBits = hashBits - bucketBits
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * domain(payloadBits) * 2.0
  }

  /** Histogram quantile estimates: one min/max pass, one 256-bin count
    * pass (map-side combined — the shuffle carries ≤ `bins` rows per
    * partition), then per-quantile linear interpolation inside the
    * selected bin. Error is bounded by one bin width of the VALUE range
    * (vs rank-error sketches like GK/t-digest, which are either
    * insertion-order-dependent or float-merge-order-dependent and so
    * can't be replayed bit-exactly by an external oracle — the fixed
    * grid is what buys determinism AND mergeability: bin counts are
    * sums).
    *
    * Output: one row per q — (q, n, est), as a LOCAL relation: both
    * passes are distributed aggregations, but the ≤`bins`-row histogram
    * is collected and the cumulative-sum + pick + interpolation run on
    * the driver. The collect is bounded by the fixed bin constant
    * (corpus-size independent — the k-means-centroid bounded-collect
    * class); doing the pick in-plan cost a Window + two broadcasts + a
    * min_by join over a 256-row frame, a cascade of ~8 scheduling
    * barriers that dominated the whole sketch on anything but huge
    * inputs. NOTE: eager — the two aggregation jobs run when this is
    * called. The arithmetic is byte-for-byte the oracle's CTE replay.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, bins: Int = 256,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(bins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val schema = StructType(Seq(StructField("q", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("est", DoubleType, nullable = true)))
    val stats = df.agg(min(v).as("mn"), max(v).as("mx"), count(v).as("n")).head()
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    if (stats.isNullAt(0) || stats.getLong(2) == 0L) return empty
    val mn = stats.getDouble(0); val mx = stats.getDouble(1)
    val n = stats.getLong(2)
    val w = (mx - mn) / bins.toDouble
    // No rebalanceForCompute here: binning is a trivial per-row
    // expression (a subtract, divide, floor), so even a 1-partition
    // input bins faster than the repartition shuffle it would pay for;
    // huge single files are split by maxPartitionBytes regardless.
    val counts = df.select(v.as("__v")).where(col("__v").isNotNull)
      .select(when(lit(mx) === lit(mn), lit(0))
        .otherwise(least(floor((col("__v") - lit(mn)) / lit(w)), lit(bins - 1)))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val cums = counts.scanLeft(0L)(_ + _._2).tail
    val rows: Seq[org.apache.spark.sql.Row] = qs.sorted.map { q =>
      val target = q * n // double, exactly the oracle's q * n
      val idx = cums.indexWhere(_ >= target)
      val (bin, cnt) = counts(idx); val cum = cums(idx)
      val est = if (mx == mn) mn
        else mn + w * (bin + (target - (cum - cnt)) / cnt)
      org.apache.spark.sql.Row(q, n,
        BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Count-Min sketch of key frequencies: `depth` independent hash rows
    * of `width` counters; cell (d, b) = Σ counts of keys with
    * h_d(key) mod width = b. Point estimate = min over rows — an upper
    * bound with error ≤ ε·N at probability 1-δ for width = e/ε,
    * depth = ln(1/δ).
    *
    * The `depth` row hashes are derived from ONE base hash by
    * Kirsch–Mitzenmacher double hashing, h_d = h1 + d·h2 (the standard
    * way Bloom/CMS implementations avoid d independent hash passes):
    * one md5/xxhash per row instead of `depth`, same error guarantees.
    */
  /** Per-group [[histogramQuantiles]]: the same fixed-grid sketch with
    * every stage keyed by `groupCol`. Group count is assumed small
    * relative to the data (event types, languages, sources — the
    * dashboard case), so the per-group (min, max, n) stats table is
    * `broadcast()` back onto the scan: the big side is read once in
    * place, binned in a narrow projection, and the only shuffle is the
    * partial-aggregated (group, bin) count — ≤ groups × bins rows. The
    * cumulative window then runs over that tiny table, partitioned by
    * group (never a single global partition).
    */
  def histogramQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, bins: Int = 256,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(bins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol).as("g"))
      .agg(min(v).as("mn"), max(v).as("mx"), count(v).as("n"))
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    val binned = graft.sources.Tables.rebalanceForCompute(
        df.select(col(groupCol).as("g"), v.as("__v"))
          .where(col("__v").isNotNull))
      .join(broadcast(stats), Seq("g"))
      .select(col("g"), when(col("mx") === col("mn"), lit(0))
        .otherwise(least(floor((col("__v") - col("mn")) / w), lit(bins - 1)))
        .cast("int").as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("bin").rowsBetween(Long.MinValue, 0)
    val cum = binned.select(col("g"), col("bin"), col("cnt"),
      sum("cnt").over(win).as("cum"))
    val qdf = df.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val picked = broadcast(qdf).crossJoin(broadcast(stats))
      .join(cum, Seq("g"))
      .where(col("cum") >= col("q") * col("n"))
      .groupBy("g", "q", "mn", "mx", "n")
      .agg(min_by(struct(col("bin"), col("cnt"), col("cum")), col("bin")).as("s"))
    picked.select(col("g").as(groupCol), col("q"), col("n"),
      round(when(col("mx") === col("mn"), col("mn")).otherwise(
        col("mn") + ((col("mx") - col("mn")) / lit(bins.toDouble)) *
          (col("s.bin") +
            (col("q") * col("n") - (col("s.cum") - col("s.cnt"))) / col("s.cnt"))),
        4).as("est"))
      .orderBy(groupCol, "q")
  }

  private def cmsBuckets(key: Column, depth: Int, width: Int,
      hashFn: Column => Column): Column = {
    val h = hashFn(key.cast("string"))
    // Split the base hash into two 30-bit halves; h1 + d·h2 stays well
    // under 2^32 so the modulo arithmetic is exact (and portable SQL).
    val h1 = pmod(h, lit(1073741824L))
    val h2 = shiftrightunsigned(h, 30)
    array((0 until depth).map(d => struct(
      lit(d).as("d"),
      pmod(h1 + lit(d.toLong) * h2, lit(width)).as("b"))): _*)
  }

  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 256,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    // Rebalance ahead of the hash+explode map (same reason as kmvDistinct).
    graft.sources.Tables.rebalanceForCompute(df)
      .select(explode(cmsBuckets(col(keyCol), depth, width, hashFn)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min point estimates for the keys of `queryKeys(keyCol)`:
    * each key probes its `depth` cells, the estimate is the min. The
    * sketch is depth×width rows — broadcast — so probing is a narrow
    * map over the query keys regardless of corpus size.
    */
  def cmsEstimate(sketch: DataFrame, queryKeys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    val probes = queryKeys
      .select(col(keyCol),
        explode(cmsBuckets(col(keyCol), depth, width, hashFn)).as("cell"))
      .select(col(keyCol), col("cell.d").as("d"), col("cell.b").as("b"))
    probes.join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy(keyCol)
      // A missing cell means nothing hashed there: count 0.
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Join-cardinality estimate via Count-Min inner products
    * (Cormode–Muthukrishnan sketch algebra): `|A ⋈ B on key| =
    * Σ_k c_A(k)·c_B(k)`, estimated as `min_d Σ_b A[d][b]·B[d][b]`.
    * Hash collisions only ADD cross terms, so the estimate never
    * under-counts — the safe direction for an optimizer deciding
    * whether a join output fits a broadcast. All arithmetic is exact
    * integers; the two sketches are depth×width rows each, so after the
    * two corpus scans the estimate itself is broadcast-sized work.
    */
  def cmsJoinCardinality(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String, depth: Int = 4, width: Int = 256,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    val sa = cmsSketch(a, aKey, depth, width, hashFn)
    val sb = cmsSketch(b, bKey, depth, width, hashFn)
    sa.select(col("d"), col("b"), col("cnt").as("ca"))
      .join(sb.select(col("d"), col("b"), col("cnt").as("cb")), Seq("d", "b"))
      .groupBy("d").agg(sum(col("ca") * col("cb")).as("dot"))
      .agg(min("dot").as("join_card_est"))
  }
}
