package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.VecOps
import graft.functions.TextOps
import graft.sources.Tables

/** Scratch: measure the PPJoin positional-filter candidate reduction on
  * the prefix-filter pair stream (exactness-preserving: an occurrence
  * may be pruned when even a full match of both remainders cannot reach
  * the required intersection).
  */
object ProfileNgram3 {
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
    val base = graft.sources.Tables.rebalanceForCompute(
      docs.select(col("doc_id").as("id"),
        TextOps.wordShingles(TextOps.tokens(col("text")), 2).as("sh")))
      .withColumn("hs", array_sort(transform(col("sh"), s => xxhash64(s))))
      .select("id", "hs").persist()
    time("base")(base.count())

    val ex = base.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val ordered = ex.join(dfreq, "h").groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    val prefLen = (floor(size(col("ord")) * lit(1.0 - t)) + 1).cast("int")
    // keyed WITH position and set size
    val keyed = ordered.select(col("id"), size(col("ord")).as("sz"),
      posexplode(transform(slice(col("ord"), lit(1), prefLen),
        s => s.getField("h"))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("pos"), col("col").as("bkey"))
      .persist()
    time("keyed")(keyed.count())

    val a = keyed.select(col("id").as("id_a"), col("sz").as("sz_a"),
      col("pos").as("pos_a"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("sz").as("sz_b"),
      col("pos").as("pos_b"), col("bkey"))
    val raw = a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
    time("raw count")(println("  raw=" + raw.count()))

    // positional upper bound: 1 + min(sz_a - pos_a, sz_b - pos_b) >= required
    val required = ceil(lit(t) / (1 + t) * (col("sz_a") + col("sz_b")) - 1e-9)
    val filtered = raw.where(
      lit(1) + least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b"))
        >= required)
    time("pos-filtered count")(println("  kept=" + filtered.count()))

    // size-only filter for comparison
    val sizeOnly = raw.where(
      least(col("sz_a"), col("sz_b")) >= greatest(col("sz_a"), col("sz_b")) * t)
    time("size-filtered count")(println("  kept=" + sizeOnly.count()))

    // end-to-end with pos filter + early-exit verify
    val shA = broadcast(base.select(col("id").as("id_a"), col("hs").as("hs_a")))
    val shB = broadcast(base.select(col("id").as("id_b"), col("hs").as("hs_b")))
    def verify(pairs: DataFrame): Long = {
      val v = pairs.select("id_a", "id_b").join(shA, "id_a").join(shB, "id_b")
        .withColumn("jaccard", VecOps.sortedJaccardGE(col("hs_a"), col("hs_b"), t))
        .where(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .distinct()
      v.write.format("noop").mode("overwrite").save(); v.count()
    }
    time("verify RAW warm")(verify(raw))
    time("verify RAW")(println("  out=" + verify(raw)))
    time("verify POS-FILTERED")(println("  out=" + verify(filtered)))
    spark.stop()
  }
}
