package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiler: how many candidate pairs do the LSH bands emit? */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
      .withColumn("hs", array_sort(transform(col("sh"), s => xxhash64(s))))
      .select("id", "hs").cache()
    println("docs=" + base.count())
    println("distinct 3-shingles=" + base.select(explode(col("hs"))).distinct().count())

    val sigs = base.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(min(xxhash64(col("h"), lit(0))).as("s0"),
        (1 until 32).map(k => min(xxhash64(col("h"), lit(k))).as(s"s$k")): _*)
    time("sigs")(sigs.count())
    val bandKeys = array((0 until 16).map { b =>
      concat_ws("_", (lit(b) +: (0 until 2).map(i => col(s"s${b * 2 + i}"))): _*)
    }: _*)
    val keyed = sigs.select(col("id"), explode(bandKeys).as("bkey"))
    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val bb = keyed.select(col("id").as("id_b"), col("bkey"))
    val raw = a.join(bb, Seq("bkey")).where(col("id_a") < col("id_b"))
    time("raw candidate pairs")(println("  pairs=" + raw.count()))
    time("distinct pairs")(println("  pairs=" + raw.select("id_a", "id_b").distinct().count()))
    time("full op")(println("  out=" + Dedup.minhashNearDups(docs, "doc_id", "text").count()))
    spark.stop()
  }
}
