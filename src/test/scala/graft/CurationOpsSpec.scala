package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Sampling, TrainingOrder}

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: overlap counts on hand-built docs") {
    val corpus = Seq(
      (1L, "a b c d e f"),       // grams abcde, bcdef — bcdef contaminated
      (2L, "x y z w v")          // one gram, clean
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "q q b c d e f q")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4))).toSet
    assert(got == Set((1L, 2L, 1L, true), (2L, 1L, 0L, false)))
  }

  test("decontaminate: short doc matches via truncated-gram convention") {
    val corpus = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq((10L, "tiny doc")).toDF("doc_id", "text")
    val r = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 5).first()
    assert(r.getLong(2) == 1L && r.getBoolean(4))
  }

  test("shuffleOrder: dense rank equals the single-partition window order") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select("doc_id")
    val got = TrainingOrder.shuffleOrder(docs, "doc_id", "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = docs
      .withColumn("k", md5(concat(lit("s1"), $"doc_id".cast("string"))))
      .withColumn("p", row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy($"k", $"doc_id"))
        .cast("long") - 1)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("p"))).toMap
    assert(got == want)
    // ranks are a dense permutation of 0..n-1
    assert(got.values.toSeq.sorted == (0L until got.size).toSeq)
  }

  test("assignSplit: stable under corpus growth, fractions roughly hold") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
      .select("doc_id")
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val full = Sampling.assignSplit(docs, "doc_id", "s7", fr)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val half = Sampling.assignSplit(docs.where($"doc_id" % 2 === 0),
        "doc_id", "s7", fr)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // growth-stability: every doc keeps its split when the corpus shrinks
    half.foreach { case (id, s) => assert(full(id) == s) }
    val n = full.size.toDouble
    val trainFrac = full.values.count(_ == "train") / n
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"trainFrac=$trainFrac")
    assert(full.values.toSet == Set("train", "val", "test"))
  }

  test("mixToBudget: kept tokens land in [budget, budget + maxDoc) per group") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val budgets = (0 to 9).map(i => s"src$i" -> 700L).toMap
    val out = Sampling.mixToBudget(docs, Seq("source"), "doc_id",
      graft.functions.TextOps.tokenCount(col("text")), budgets, seed = "t1")
    val kept = out.where($"keep")
      .groupBy("source").agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      assert(budgets.contains(r.getString(0))) // unbudgeted groups dropped
      val tok = r.getLong(1)
      assert(tok >= 700L && tok < 700L + r.getInt(2), s"$r")
    }
    // membership is independent of input partitioning
    val ids = out.where($"keep").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val again = Sampling.mixToBudget(docs.repartition(7), Seq("source"),
      "doc_id", graft.functions.TextOps.tokenCount(col("text")), budgets, "t1")
      .where($"keep").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("temperatureSample: sqrt allocation exact, caps at group size, invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // groups: a=100 rows, b=25, c=1  ->  w_fp = floor(sqrt(n)*2^20)
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++ Seq((126L, "c")))
      .toDF("id", "g")
    val out = Sampling.temperatureSample(df, "g", "id", totalBudget = 40L,
      seed = "t")
    val alloc = out.select("g", "n_g", "alloc").distinct().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wA = math.floor(math.sqrt(100.0) * 1048576).toLong
    val wB = math.floor(math.sqrt(25.0) * 1048576).toLong
    val wC = math.floor(math.sqrt(1.0) * 1048576).toLong
    val sum = wA + wB + wC
    assert(alloc("a") == (100L, 40L * wA / sum))
    assert(alloc("b") == (25L, 40L * wB / sum))
    assert(alloc("c") == (1L, math.min(40L * wC / sum, 1L)))
    // kept counts match allocations
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == alloc("a")._2 && counts("b") == alloc("b")._2)
    // partition invariance
    val again = Sampling.temperatureSample(df.repartition(13), "g", "id",
      totalBudget = 40L, seed = "t")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("normalizeText: NFC composition, zero-width scrub, ws collapse") {
    import graft.functions.TextOps
    def norm(s: String): String =
      Seq(s).toDF("text").select(TextOps.normalizeText($"text")).first().getString(0)
    // decomposed e + COMBINING ACUTE (U+0301) -> composed e-acute (U+00E9)
    assert(norm("cafe\u0301") == "caf\u00e9")
    // zero-width space / BOM / joiner / controls become (collapsed) spaces
    assert(norm("a\u200bb") == "a b")
    assert(norm("\ufeffx y\t\t z \r\n") == "x y z")
    assert(norm("a b\u200dc") == "a b c")
    // ascii fast path is identity, and the op is idempotent
    assert(norm("plain text") == "plain text")
    assert(norm(norm(" a\u200b\u200b b ")) == norm(" a\u200b\u200b b "))
    // interpreted eval path agrees with the DataFrame (codegen) path
    val e = graft.expressions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "cafe\u0301", org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == "caf\u00e9")
  }

  test("corpus_report: rollup yields leaf + per-source + grand-total rows") {
    val out = graft.queries.ExtensionQueries
      .queries("corpus_report")(spark, sf0001)
      .collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val perSource = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    val total = graft.sources.Tables.load(spark, sf0001, "documents").count()
    assert(grand(0).getAs[Long]("n_docs") == total)
    assert(perSource.map(_.getAs[Long]("n_docs")).sum == total)
    assert(leaves.map(_.getAs[Long]("n_docs")).sum == total)
    out.foreach { r =>
      val q = r.getAs[Double]("avg_quality")
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $r")
    }
  }

  test("assignSplit rejects fractions that do not sum to 1") {
    val df = Seq(1L).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "doc_id", "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
