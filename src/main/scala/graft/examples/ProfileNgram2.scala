package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.VecOps
import graft.functions.TextOps
import graft.sources.Tables

/** Scratch profiler comparing ngram-jaccard VERIFICATION strategies on the
  * production (codegen) path. Stages before verification are shared.
  */
object ProfileNgram2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val t = 0.6
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), 2).as("sh"))
      .withColumn("hs", array_sort(transform(col("sh"), s => xxhash64(s))))
      .select("id", "hs")
      .persist()
    time("base materialize")(base.count())

    val ex = base.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, "h").groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    val prefLen = (floor(size(col("ord")) * lit(1.0 - t)) + 1).cast("int")
    val keyed = ordered.select(col("id"),
      explode(transform(slice(col("ord"), lit(1), prefLen),
        s => s.getField("h"))).as("bkey")).persist()
    time("keyed materialize")(keyed.count())

    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bkey"))
    val rawPairs = a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    val shA = broadcast(base.select(col("id").as("id_a"), col("hs").as("hs_a")))
    val shB = broadcast(base.select(col("id").as("id_b"), col("hs").as("hs_b")))

    def verifyIntersect(pairs: DataFrame): DataFrame =
      pairs.join(shA, "id_a").join(shB, "id_b")
        .where(least(size(col("hs_a")), size(col("hs_b"))) >=
          greatest(size(col("hs_a")), size(col("hs_b"))) * lit(t))
        .withColumn("c", VecOps.sortedIntersectCount(col("hs_a"), col("hs_b")))
        .withColumn("jaccard",
          col("c") / (size(col("hs_a")) + size(col("hs_b")) - col("c")))
        .where(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .distinct()

    def verifyEarlyExit(pairs: DataFrame): DataFrame =
      pairs.join(shA, "id_a").join(shB, "id_b")
        .withColumn("jaccard", VecOps.sortedJaccardGE(col("hs_a"), col("hs_b"), t))
        .where(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .distinct()

    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); df.count() }

    // warmups then timed
    time("A raw+intersect WARM")(noop(verifyIntersect(rawPairs)))
    time("A raw+intersect")(noop(verifyIntersect(rawPairs)))
    time("B distinct+intersect")(noop(verifyIntersect(rawPairs.distinct())))
    time("C raw+earlyexit WARM")(noop(verifyEarlyExit(rawPairs)))
    time("C raw+earlyexit")(noop(verifyEarlyExit(rawPairs)))
    time("D distinct+earlyexit")(noop(verifyEarlyExit(rawPairs.distinct())))
    // sanity: same output count
    println("A rows=" + verifyIntersect(rawPairs).count())
    println("C rows=" + verifyEarlyExit(rawPairs).count())
    spark.stop()
  }
}
