package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** The bucketed rank/running-sum decomposition must reproduce the
  * single-partition window EXACTLY — same rank, same running sum, same
  * ntile membership — for any bucket granularity (including pathological
  * one-bucket and one-row-per-bucket extremes) and for descending
  * orders via sign-flipped range buckets.
  */
class RanksSpec extends SparkSpec {

  private lazy val li = spark.read
    .parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity").cast("long").as("qty"))
    .withColumn("uid",
      col("l_orderkey") * 10 + col("l_linenumber"))

  test("bucketedRowNumber matches row_number over the total order") {
    val expect = li.withColumn("rk",
      row_number().over(Window.orderBy(col("qty"), col("uid")))
        .cast("long"))
    for (target <- Seq(1, 7, 4096)) {
      val stats = broadcast(
        li.agg(min("qty").as("lo"), max("qty").as("hi")))
      val got = Ranks.bucketedRowNumber(li.crossJoin(stats),
        Ranks.rangeBucket(col("qty"), col("lo"), col("hi"), target),
        Seq(col("qty"), col("uid")), "rk")
      val diff = got.select("uid", "rk")
        .except(expect.select("uid", "rk"))
      assert(diff.isEmpty, s"rank mismatch at target=$target")
    }
  }

  test("bucketedRowNumberBy matches per-partition row_number in one pass") {
    // Rank independently within each l_partkey%5 group — the stacked
    // many-orders-in-one-pass shape customer_rfm uses.
    val g = li.withColumn("grp", pmod(col("l_partkey"), lit(5)))
    val expect = g.withColumn("rk",
      row_number().over(Window.partitionBy("grp")
        .orderBy(col("qty"), col("uid"))).cast("long"))
    val stats = g.groupBy("grp")
      .agg(min("qty").as("lo"), max("qty").as("hi"))
    val got = Ranks.bucketedRowNumberBy(g.join(broadcast(stats), "grp"),
      Seq("grp"),
      Ranks.rangeBucket(col("qty"), col("lo"), col("hi"), 64),
      Seq(col("qty"), col("uid")), "rk")
    assert(got.select("uid", "grp", "rk")
      .except(expect.select("uid", "grp", "rk")).isEmpty)
  }

  test("bucketedRunningSum matches cumulative window, descending order") {
    val expect = li.withColumn("cum",
      sum(col("qty")).over(Window.orderBy(col("qty").desc, col("uid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stats = broadcast(
      li.agg(min("qty").as("lo"), max("qty").as("hi")))
    val got = Ranks.bucketedRunningSum(li.crossJoin(stats), col("qty"),
      Ranks.rangeBucket(-col("qty"), -col("hi"), -col("lo"), 16),
      Seq(col("qty").desc, col("uid")), "cum")
    assert(got.select("uid", "cum")
      .except(expect.select("uid", "cum")).isEmpty)
  }

  test("string-prefix buckets: alphabetical rank of a token vocab") {
    val vocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\W+")).as("tok"))
      .where(length(col("tok")) > 0).distinct()
    val expect = vocab.withColumn("idx",
      row_number().over(Window.orderBy("tok")).cast("long"))
    val got = Ranks.bucketedRowNumber(vocab,
      substring(col("tok"), 1, 2), Seq(col("tok")), "idx")
    assert(got.except(expect).isEmpty)
  }

  test("ntileFromRank reproduces ntile(n) for ragged row counts") {
    // 1..23 over n=4 exercises fat tiles (23 = 4*5+3: three 6-row
    // tiles then 5-row); n=5 over 23 gives 3 fat tiles of 5... also
    // cover cnt < n (every row its own tile) and cnt divisible by n.
    import spark.implicits._
    for ((cnt, n) <- Seq((23, 4), (23, 5), (3, 4), (20, 4), (1, 4))) {
      val df = (1 to cnt).toDF("v")
      val expect = df.withColumn("t",
        ntile(n).over(Window.orderBy("v")))
      val got = df
        .withColumn("rk", row_number().over(Window.orderBy("v"))
          .cast("long"))
        .withColumn("t", Ranks.ntileFromRank(col("rk"),
          lit(cnt.toLong), n))
        .drop("rk")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"ntile mismatch cnt=$cnt n=$n")
    }
  }
}
