package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.RowHash
import graft.operators.IncrementalDedup
import graft.types.UniversalType

/** Property-based checks from SURVEY §5.2: hash invariances, dedup
  * idempotence, datetime round-trips — over ScalaCheck-generated inputs
  * instead of the reference's fixed tables. Sampling is seeded, so runs
  * are deterministic (no scalatestplus bridge in the dependency set).
  */
class PropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.choose(-1000000L, 1000000L).map(_.toString),
    Gen.const(""),
  )
  private val rowGen: Gen[List[String]] = Gen.listOfN(4, cellGen)

  private val schema = StructType(Seq("c1", "c2", "c3", "c4")
    .map(StructField(_, StringType)))

  private def hashOf(cells: List[String]): String = {
    val df = spark.createDataFrame(List(Row(cells: _*)).asJava, schema)
    df.select(RowHash.ofAllColumns(df)).first().getString(0)
  }

  test("hash is invariant under cell permutation and case") {
    val rnd = new scala.util.Random(7)
    samples(rowGen, 20).foreach { cells =>
      val h1 = hashOf(cells)
      val h2 = hashOf(rnd.shuffle(cells).map(_.toUpperCase))
      assert(h1 == h2, s"cells=$cells")
    }
  }

  test("hash equals the reference algorithm (independent Scala model)") {
    samples(rowGen, 20).foreach { cells =>
      // etl.go:61-68 re-implemented directly on JVM strings (ASCII input
      // keeps Java toLowerCase == UTF8 binary semantics).
      val expected = {
        val sorted = cells.map(_.toLowerCase).sorted
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(sorted.mkString("").getBytes("UTF-8"))
        md.digest().map("%02x".format(_)).mkString
      }
      assert(hashOf(cells) == expected, s"cells=$cells")
    }
  }

  test("dedup filter is idempotent and anti-monotone") {
    val rows = (1 to 40).map(i => Row(s"a$i", s"b${i % 7}", s"c${i % 3}", i.toString))
    val batch = spark.createDataFrame(rows.asJava, schema)
    val target = spark.createDataFrame(rows.take(15).asJava, schema)
    val once = IncrementalDedup(batch, target)
    val twice = IncrementalDedup(once, target)
    assert(once.count() == 25)
    assert(twice.count() == once.count())
  }

  test("early-exit jaccard equals the naive model on random sorted sets") {
    import spark.implicits._
    import graft.expressions.VecOps
    val setGen: Gen[Seq[Long]] = for {
      n <- Gen.choose(0, 60)
      // small value domain forces real overlaps
      xs <- Gen.listOfN(n, Gen.choose(0L, 80L))
    } yield xs.distinct.sorted
    val pairs = samples(Gen.zip(setGen, setGen), 60)
    for (t <- Seq(0.0, 0.3, 0.6, 0.9)) {
      val rows = pairs.map { case (a, b) => (a.toArray, b.toArray) }
      val df = rows.toDF("a", "b")
        .select(VecOps.sortedJaccardGE($"a", $"b", t).as("j"),
          VecOps.sortedIntersectCount($"a", $"b").as("c"),
          org.apache.spark.sql.functions.size($"a").as("na"),
          org.apache.spark.sql.functions.size($"b").as("nb"))
        .collect()
      df.zip(pairs).foreach { case (r, (a, b)) =>
        val inter = a.toSet.intersect(b.toSet).size
        val union = a.toSet.union(b.toSet).size
        val naive = if (union == 0) 0.0 else inter.toDouble / union
        val expected = if (naive >= t) naive else -1.0
        assert(r.getDouble(0) == expected,
          s"t=$t a=$a b=$b got=${r.getDouble(0)} want=$expected")
        assert(r.getInt(1) == inter, s"intersect a=$a b=$b")
      }
    }
  }

  test("early-exit jaccard: interpreted eval agrees with codegen") {
    import graft.expressions.SortedLongJaccardGE
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val setGen: Gen[Seq[Long]] = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield xs.distinct.sorted
    samples(Gen.zip(setGen, setGen), 40).foreach { case (a, b) =>
      val expr = SortedLongJaccardGE(
        Literal.create(a.toArray, ArrayType(LongType)),
        Literal.create(b.toArray, ArrayType(LongType)), Literal(0.5))
      val interpreted = expr.nullSafeEval(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray),
        java.lang.Double.valueOf(0.5)).asInstanceOf[Double]
      // the DataFrame path above runs codegen; eval() here runs the
      // interpreted path — cross-check via the same naive model
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val naive = if (union == 0) 0.0 else inter.toDouble / union
      val expected = if (naive >= 0.5) naive else -1.0
      assert(interpreted == expected, s"a=$a b=$b")
    }
  }

  test("repetitionStats: fracs in [0,1], ttr in (0,1], n_grams = tokens-(n-1) or 1") {
    import spark.implicits._
    val docGen = Gen.choose(0, 40).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "b", "c", "dd", "eee")).map(_.mkString(" ")))
    val docs = samples(docGen, 25).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .filter(_._2.trim.nonEmpty)
    val rows = graft.functions.TextOps
      .repetitionStats(docs.toDF("id", "text"), "id", "text", n = 2)
      .collect()
    assert(rows.length == docs.size)
    val nTokens = docs.map { case (i, t) =>
      i -> t.split("\\s+").count(_.nonEmpty) }.toMap
    rows.foreach { r =>
      val (top, dup, ttr) = (r.getAs[Double]("top_gram_frac"),
        r.getAs[Double]("dup_gram_frac"), r.getAs[Double]("ttr"))
      assert(top > 0 && top <= 1 && dup >= 0 && dup <= 1 && ttr > 0 && ttr <= 1)
      assert(dup == 0.0 || dup >= top, s"dup<top in $r") // dup counts every repeated gram
      assert(r.getAs[Long]("n_grams") ==
        math.max(nTokens(r.getAs[Long]("id")) - 1, 1))
    }
  }

  test("normalizeText: idempotent and NFC-stable on random unicode mixes") {
    import spark.implicits._
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
      Gen.const("\u00e9"), Gen.const("e\u0301"), Gen.const("\u200b"),
      Gen.const("\ufeff"), Gen.const(""))
    val strGen = Gen.choose(0, 30).flatMap(k =>
      Gen.listOfN(k, charGen).map(_.mkString))
    val inputs = samples(strGen, 30)
    def normAll(ss: Seq[String]): Seq[String] =
      ss.toDF("text")
        .select(graft.functions.TextOps.normalizeText($"text"))
        .collect().map(_.getString(0)).toSeq
    val once = normAll(inputs)
    assert(normAll(once) == once) // idempotent
    once.foreach { s =>
      assert(java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      assert(!s.exists(c => c.isControl ||
        c == '\u200b' || c == '\u200c' || c == '\u200d' || c == '\ufeff'))
      assert(!s.contains("  ") && s == s.trim)
    }
  }

  test("assignSplit covers every row with exactly one label at any fraction mix") {
    import spark.implicits._
    val fracsGen = Gen.choose(1, 9999).map { cut =>
      Seq("x" -> cut / 10000.0, "y" -> (10000 - cut) / 10000.0) }
    val ids = (1L to 200L).toDF("id")
    samples(fracsGen, 10).foreach { fr =>
      val out = graft.operators.Sampling.assignSplit(ids, "id", "ps", fr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out.length == 200)
      out.foreach { case (_, b, s) =>
        assert(b >= 0 && b < 10000)
        val cut = math.round(fr.head._2 * 10000)
        assert(s == (if (b < cut) "x" else "y"))
      }
    }
  }

  test("datetime source→universal→sink round trip") {
    import spark.implicits._
    val tsGen = for {
      y <- Gen.choose(1990, 2030); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d"
    samples(tsGen, 20).foreach { src =>
      val round = Seq(src).toDF("c")
        .select(UniversalType.fromUniversalDatetime(
          UniversalType.toUniversalDatetime($"c")).as("r"))
        .first().getString(0)
      assert(round == src)
    }
  }

  test("snapshotDiff: diff(x, x) empty; swapping sides swaps insert/delete") {
    import spark.implicits._
    val rowGen3 = Gen.listOfN(3, Gen.listOfN(2, cellGen))
    samples(rowGen3, 8).zipWithIndex.foreach { case (rows, i) =>
      val a = rows.zipWithIndex.map { case (cs, j) => (j.toLong, cs.head, cs(1)) }
        .toDF("k", "x", "y")
      val b = rows.reverse.zipWithIndex
        .map { case (cs, j) => (j.toLong + i, cs.head, cs(1)) }
        .toDF("k", "x", "y")
      assert(graft.operators.Merge.snapshotDiff(a, a, Seq("k"), Seq("x", "y"))
        .count() == 0L)
      val fwd = graft.operators.Merge.snapshotDiff(a, b, Seq("k"), Seq("x", "y"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val rev = graft.operators.Merge.snapshotDiff(b, a, Seq("k"), Seq("x", "y"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fwd.keySet == rev.keySet)
      fwd.foreach { case (k, ct) =>
        val want = ct match {
          case "insert" => "delete"
          case "delete" => "insert"
          case other    => other
        }
        assert(rev(k) == want, s"key $k: fwd=$ct rev=${rev(k)}")
      }
    }
  }

  test("temperatureSample: total alloc bounded by budget, monotone in group size") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sizesGen = Gen.listOfN(4, Gen.choose(1, 60))
    samples(sizesGen, 6).foreach { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (1 to n).map(i => (g.toLong * 1000 + i, s"g$g")) }
      val df = rows.toDF("id", "grp")
      val budget = 30L
      val out = graft.operators.Sampling
        .temperatureSample(df, "grp", "id", budget, "p")
      val alloc = out.select("grp", "n_g", "alloc").distinct().collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(alloc.values.map(_._2).sum <= budget)
      alloc.values.foreach { case (n, a) => assert(a <= n) }
      // monotone: a strictly larger group never allocates less
      val byN = alloc.values.toSeq.sortBy(_._1)
      byN.zip(byN.tail).foreach { case ((n1, a1), (n2, a2)) =>
        if (n1 < n2) assert(a1 <= a2, s"alloc not monotone: $byN") }
      // kept rows per group == alloc
      val counts = out.groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      alloc.foreach { case (g, (_, a)) =>
        assert(counts.getOrElse(g, 0L) == a) }
    }
  }

  test("pageRankInt: total mass bounded by scale, every node >= teleport base") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 8L))).map(_.filter(e => e._1 != e._2))
    samples(edgeGen, 6).filter(_.nonEmpty).foreach { es =>
      val ranks = graft.operators.Graph
        .pageRankInt(es.toDF("src", "dst"), "src", "dst", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = ranks.size.toLong
      val scale = 1000000000000L
      val base = (15L * scale / 100) / n
      // dangling mass is dropped, integer division only rounds down:
      // total never exceeds the unit mass, each node keeps >= teleport
      assert(ranks.values.sum <= scale)
      ranks.values.foreach(r => assert(r >= base))
    }
  }

  test("tdivSql: both engines' division semantics normalize to truncation toward zero") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = for {
      x <- Gen.choose(-1000000000000000000L, 1000000000000000000L)
      k <- Gen.choose(1L, 1000000000L)
    } yield (x, k)
    val cases = samples(gen, 40) ++
      Seq((-7L, 2L), (7L, 2L), (0L, 5L), (-1L, 1000000000L), (-999999999999999999L, 7L))
    // The contract: sign(x)·(|x| div k) — truncation toward zero.
    def model(x: Long, k: Long): Long = if (x >= 0) x / k else -((-x) / k)
    cases.foreach { case (x, k) =>
      // A FLOOR-division engine (DuckDB `//`) evaluating the same CASE
      // lands on the model too: the division operands are non-negative
      // inside the CASE, where floor == truncation.
      val viaFloor =
        if (x >= 0) Math.floorDiv(x, k) else -Math.floorDiv(-x, k)
      assert(viaFloor == model(x, k))
      // …while BARE floor division diverges by 1 on negative non-exact
      // inputs — the reason the helper exists.
      if (x < 0 && x % k != 0) assert(Math.floorDiv(x, k) == model(x, k) - 1)
    }
    // Spark's `div` (truncating) through the same CASE: equal to model.
    val got = cases.toDF("x", "k").select(col("x"), col("k"),
      expr(graft.operators.Pca.tdivSql("x", "k")).cast("long").as("t")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == model(r.getLong(0), r.getLong(1)),
        s"x=${r.getLong(0)} k=${r.getLong(1)}")
    }
  }

  test("hhi: decimal sum-of-squares is exact at cent scales where double degrades") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Revenue cents up to 10^17 per supplier: squares ≈ 10^34 — far past
    // double's 2^53 integer range, comfortably inside DECIMAL(38,0)
    // (40 × 10^34 < 10^38). The supplier_concentration_hhi aggregation
    // must reproduce exact BigInt arithmetic.
    val gen = Gen.listOfN(40, Gen.choose(1L, 100000000000000000L))
    samples(gen, 5).foreach { cents =>
      val df = cents.toDF("cents")
      val c = col("cents").cast("decimal(19,0)")
      val row = df.agg(sum(col("cents")).as("total"), sum(c * c).as("sumsq")).head
      val modelSumSq = cents.map(v => BigInt(v) * BigInt(v)).sum
      assert(BigInt(row.getDecimal(1).toBigInteger) == modelSumSq,
        "decimal sum-of-squares not exact")
      assert(row.getLong(0) == cents.sum)
    }
  }

  test("zipf slope: log2 binning + moment slope matches an independent model") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def lg(v: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(v)
    def slope(counts: Seq[Long]): Option[Double] = {
      // independent formulation: numberOfLeadingZeros instead of the
      // query's length(bin(c))-1 string path
      val bins = counts.groupBy(lg).map { case (x, g) => (x, lg(g.size.toLong)) }.toSeq
      val n = bins.size.toLong
      val sx = bins.map(_._1).sum; val sy = bins.map(_._2).sum
      val sxy = bins.map(p => p._1 * p._2).sum
      val sxx = bins.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      if (den == 0) None
      else Some(BigDecimal((n * sxy - sx * sy).toDouble / den.toDouble)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    def sparkSlope(counts: Seq[Long]): Option[Double] = {
      // the text_zipf_slope expression tree from the counts stage down
      val bins = counts.toDF("c")
        .select((length(bin(col("c"))) - 1).cast("long").as("x"))
        .groupBy("x").agg(count(lit(1)).as("nt"))
        .select(col("x"), (length(bin(col("nt"))) - 1).cast("long").as("y"))
      val r = bins.agg(count(lit(1)).as("n_bins"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"))
        .select(
          when(col("n_bins") * col("sxx") - col("sx") * col("sx") === 0,
            lit(null).cast("double"))
            .otherwise(round(
              (col("n_bins") * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
                (col("n_bins") * col("sxx") - col("sx") * col("sx")),
              8)).as("slope")).head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val gen = Gen.listOfN(200, Gen.frequency(
      8 -> Gen.choose(1L, 50L), 3 -> Gen.choose(50L, 5000L),
      1 -> Gen.choose(5000L, 100000L)))
    samples(gen, 5).foreach { counts =>
      assert(sparkSlope(counts) == slope(counts), s"counts head=${counts.take(8)}")
    }
    // degenerate single-bin input → null slope, not a division blow-up
    assert(sparkSlope(Seq.fill(30)(17L)) == None)
    assert(slope(Seq.fill(30)(17L)) == None)
  }

  test("assortativity: double moment products correct where integer products wrap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Degrees in [10^8, 3·10^8] over 50 edges: each SUM fits a long
    // (Σx² ≤ 4.5·10^18) but moment PRODUCTS like sx·sy are ≥ 2.5·10^19
    // > 2^63 on every sample — the exact regime the query's
    // multiply-in-double tree exists for.
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(100000000L, 300000000L),
        Gen.choose(100000000L, 300000000L)))
    samples(gen, 5).foreach { pairs =>
      val r = pairs.toDF("x", "y")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(round({
          def d(c: org.apache.spark.sql.Column) = c.cast("double")
          (d(col("n_pairs")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            sqrt((d(col("n_pairs")) * d(col("sxx")) -
              d(col("sx")) * d(col("sx"))) *
              (d(col("n_pairs")) * d(col("syy")) -
                d(col("sy")) * d(col("sy"))))
        }, 6).as("r")).head.getDouble(0)
      // exact model: BigInt moments, double only for the final ratio
      val n = BigInt(pairs.size)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val num = n * sxy - sx * sy
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      val model = num.toDouble / math.sqrt(den.toDouble)
      assert(math.abs(r - model) <= 2e-5, s"got $r model $model")
      // the overflow regime really was reached: a Long product wraps
      assert((sx * sy) > BigInt(Long.MaxValue) ||
        (n * sxx) > BigInt(Long.MaxValue),
        "generator failed to reach the integer-overflow regime")
    }
  }
}
