package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

/** Sort-clustered layout: files cover disjoint key ranges, so point
  * queries touch one file instead of all of them.
  */
class LayoutSpec extends SparkSpec {

  test("writeSorted produces range-disjoint files and point queries prune to them") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/li"
    val li = Tables.load(spark, sf0001, "lineitem")
    Layout.writeSorted(li, dir, numFiles = 4, cols = Seq("l_shipdate"))

    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())

    // Per-file (min, max) of the cluster column must be non-overlapping
    // (ISO timestamp strings sort chronologically).
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate").cast("string")).as("lo"),
        max(col("l_shipdate").cast("string")).as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $hi > $lo")
    }

    // A point predicate draws rows from exactly one file (vs the
    // unsorted layout, where every file contains every date region).
    val someDate = li.agg(min("l_shipdate")).head().get(0)
    val touched = back.where(col("l_shipdate") === lit(someDate))
      .select(input_file_name()).distinct().count()
    assert(touched == 1)
  }

  test("compact: many small files → few target-sized, content identical") {
    val base = Files.createTempDirectory("graft-compact").toString
    val li = Tables.load(spark, sf0001, "lineitem")
    // Simulate an incremental-append mess: 64 tiny files.
    li.repartition(64).write.parquet(s"$base/small")
    val stats = Layout.compact(spark, s"$base/small", s"$base/big",
      targetFileBytes = 256L << 10)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter < 16, s"still ${stats.filesAfter} files")
    assert(stats.filesAfter ==
      math.max(1, (stats.bytesBefore + (256L << 10) - 1) / (256L << 10)))
    // content is the same multiset of rows (column order normalized —
    // parquet round-trips preserve names, not necessarily positions)
    def multiset(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.toSeq.mkString("|")).toSeq.sorted
    }
    assert(multiset(spark.read.parquet(s"$base/big")) == multiset(li))

    // clustered compaction preserves the min-max pruning property
    val statsSorted = Layout.compact(spark, s"$base/small", s"$base/sorted",
      targetFileBytes = 256L << 10, cols = Seq("l_shipdate"))
    assert(statsSorted.filesAfter > 1)
    val sorted = spark.read.parquet(s"$base/sorted")
    val someDate = li.agg(min("l_shipdate")).head().get(0)
    val touched = sorted.where(col("l_shipdate") === lit(someDate))
      .select(input_file_name()).distinct().count()
    assert(touched == 1)
  }
}
