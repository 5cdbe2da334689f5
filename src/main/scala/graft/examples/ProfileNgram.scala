package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Scratch profiler for the ngram jaccard pipeline stages. */
object ProfileNgram {
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
    println(s"docs: ${docs.count()}")

    val base = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), 2).as("sh"))
      .withColumn("hs", array_sort(transform(col("sh"), s => xxhash64(s))))
      .select("id", "hs")

    time("base count")(base.count())
    val cached = base.cache()
    time("base cache")(cached.count())
    time("base count cached")(cached.count())

    val ex = cached.select(col("id"), explode(col("hs")).as("h"))
    time("exploded")(println("  rows=" + ex.count()))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    time("dfreq")(println("  keys=" + dfreq.count()))
    val ordered = ex.join(dfreq, "h").groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    time("ordered")(ordered.count())

    val prefLen = (floor(size(col("ord")) * lit(0.4)) + 1).cast("int")
    val keyed = ordered.select(col("id"),
      explode(transform(slice(col("ord"), lit(1), prefLen), s => s.getField("h"))).as("bkey"))
    time("keyed")(println("  keys=" + keyed.count()))

    val a = keyed.select(col("id").as("id_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bkey"))
    val raw = a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
    time("raw pairs")(println("  pairs=" + raw.count()))
    val cands = raw.select("id_a", "id_b").distinct()
    time("distinct pairs")(println("  pairs=" + cands.count()))

    val shA = cached.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val shB = cached.select(col("id").as("id_b"), col("hs").as("hs_b"))
    val verified = cands.join(shA, "id_a").join(shB, "id_b")
      .where(size(col("hs_a")) * 0.6 <= size(col("hs_b")) &&
        size(col("hs_b")) * 0.6 <= size(col("hs_a")))
      .withColumn("jaccard", TextOps.jaccard(col("hs_a"), col("hs_b")))
      .where(col("jaccard") >= 0.6)
    time("verified")(println("  out=" + verified.count()))
    spark.stop()
  }
}
