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
}
