package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-sum pack assignment: exclusive cumsum over budget") {
    val df = Seq(
      ("a", 1L, 100), ("a", 2L, 100), ("a", 3L, 100),
      ("a", 4L, 100), ("b", 1L, 300)
    ).toDF("src", "id", "len")
    val got = Packing.assignPacks(df, Seq("src"), "id", col("len"), budget = 256)
      .select("src", "id", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // a: cum-exclusive 0,100,200,300 / 256 -> packs 0,0,0,1 ; b: 0/256 -> 0
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 1L), ("b", 1L, 0L)))
  }

  test("pack ids are monotone per partition and deterministic across reruns") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    def run() = Packing.assignPacks(docs, Seq("source"), "doc_id",
        graft.functions.TextOps.tokenCount(col("text")), budget = 256)
      .select("source", "doc_id", "n_tokens", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val first = run()
    assert(first.toSet == run().toSet)
    // within each source, in doc_id order: pack_id non-decreasing and equal
    // to floor(exclusive-cumsum / budget) recomputed independently
    first.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, pack) =>
        assert(pack == cum / 256, s"pack=$pack cum=$cum n=$n")
        cum += n
      }
    }
  }

  test("materialize: sequences concatenate in order, invariant to partitioning") {
    val df = Seq(
      ("a", 1L, "one"), ("a", 2L, "two"), ("a", 3L, "three"), ("b", 9L, "nine")
    ).toDF("src", "id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.materialize(d, Seq("src"), "id", "text", lit(100), budget = 150,
          sep = "|")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
    val got = run(df)
    // a: cum-exclusive 0,100,200 / 150 -> packs 0,0,1 ; b: pack 0
    assert(got == Set(
      ("a", 0L, 2L, 200L, "one|two"), ("a", 1L, 1L, 100L, "three"),
      ("b", 0L, 1L, 100L, "nine")))
    assert(run(df.repartition(5)) == got)
  }

  test("budget must be positive") {
    val df = Seq(("a", 1L, 1)).toDF("src", "id", "len")
    intercept[IllegalArgumentException] {
      Packing.assignPacks(df, Seq("src"), "id", col("len"), budget = 0)
    }
  }

  test("repetitionStats: fracs and ttr on a hand-checked doc") {
    val df = Seq((1L, "a b a b a c")).toDF("id", "text")
    val r = graft.functions.TextOps.repetitionStats(df, "id", "text", n = 2).first()
    // 2-grams: "a b","b a","a b","b a","a c" -> n=5, top("a b")=2, dup=4
    assert(r.getAs[Long]("n_grams") == 5L)
    assert(math.abs(r.getAs[Double]("top_gram_frac") - 0.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("dup_gram_frac") - 0.8) < 1e-9)
    assert(math.abs(r.getAs[Double]("ttr") - 0.5) < 1e-9) // {a,b,c}/6
  }

  test("repetitionStats: doc shorter than n yields one truncated gram") {
    val df = Seq((1L, "solo")).toDF("id", "text")
    val r = graft.functions.TextOps.repetitionStats(df, "id", "text", n = 2).first()
    assert(r.getAs[Long]("n_grams") == 1L)
    assert(r.getAs[Double]("dup_gram_frac") == 0.0)
  }
}
