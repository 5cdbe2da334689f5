package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables
import Profiling.{noop, time}

/** Scratch: round-3 stage breakdown of the dedup hot path — where do
  * ngram/minhash/clusters actually spend their seconds at sf0.1?
  */
object ProfileR3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Profiling.session()

    val docs = Tables.load(spark, dir, "documents")
    println(s"docs: ${docs.count()}")

    // Stage 1: shingle table (the HOF-heavy narrow map), no persist.
    def shingles(n: Int): DataFrame =
      Tables.rebalanceForCompute(docs)
        .select(col("doc_id").as("id"),
          TextOps.wordShingles(TextOps.tokens(col("text")), n).as("sh"))
        .withColumn("hs", coalesce(
          array_sort(transform(col("sh"), s => xxhash64(s))),
          array().cast("array<bigint>")))
        .select("id", "hs")

    time("shingle2 narrow")(noop(shingles(2)))
    time("shingle3 narrow")(noop(shingles(3)))

    // tokens alone vs shingles vs hash+sort
    val toks = Tables.rebalanceForCompute(docs)
      .select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("t"))
    time("tokens alone")(noop(toks))
    time("shingles no hash")(noop(
      toks.select(col("id"), TextOps.wordShingles(col("t"), 3).as("sh"))))

    val base2 = shingles(2).persist()
    base2.count()

    // Stage 2 (ngram): dfreq + rarest-first prefix keys.
    val ex = base2.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    println("distinct shingles(2): " + dfreq.count())
    val ordered = ex.join(dfreq, "h").groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"))
    val prefLen = (floor(size(col("ord")) * lit(0.4)) + 1).cast("int")
    val keyed = ordered.select(col("id"),
      explode(transform(slice(col("ord"), lit(1), prefLen),
        s => s.getField("h"))).as("bkey"))
    time("ngram keyed")(noop(keyed))

    val keyedP = keyed.persist(); keyedP.count()
    val a = keyedP.select(col("id").as("id_a"), col("bkey"))
    val b = keyedP.select(col("id").as("id_b"), col("bkey"))
    val pairs = a.join(b, Seq("bkey")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    println("candidate occurrences: " + pairs.count())

    // Stage 3 (ngram): verify join + early-exit scan from the cached sides.
    val shA = broadcast(base2.select(col("id").as("id_a"), col("hs").as("hs_a")))
    val shB = broadcast(base2.select(col("id").as("id_b"), col("hs").as("hs_b")))
    val verified = pairs.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        graft.expressions.VecOps.sortedJaccardGE(col("hs_a"), col("hs_b"), 0.6))
      .where(col("jaccard") >= 0.6)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .distinct()
    time("ngram verify (from cached keyed)")(noop(verified))

    // Stage 2' (minhash): signature via explode + 32 min-aggs.
    val base3 = shingles(3).persist(); base3.count()
    val sigs = base3.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(min(xxhash64(col("h"), lit(0))).as("s0"),
        (1 until 32).map(k => min(xxhash64(col("h"), lit(k))).as(s"s$k")): _*)
    time("minhash sigs explode+agg")(noop(sigs))

    spark.stop()
  }
}
