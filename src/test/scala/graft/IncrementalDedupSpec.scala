package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.IncrementalDedup

/** Dedup filter cases from `etl_test.go:101-238` (FIXTURES.md A1). */
class IncrementalDedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq("col1", "col2", "col3", "col4")
    .map(StructField(_, StringType)))
  private def df(rows: Row*) = spark.createDataFrame(rows.asJava, schema)

  private val batch = df(
    Row("1", "2", "3", "4"), Row("5", "6", "7", "8"), Row("9", "10", "11", "12"))

  test("empty snapshot → batch unchanged") {
    val empty = df().limit(0)
    assert(IncrementalDedup(batch, empty).count() == 3)
  }

  test("non-matching target rows → batch unchanged") {
    val tgt = df(Row("x", "y", "z", "w"))
    assert(IncrementalDedup(batch, tgt).count() == 3)
  }

  test("partial match → matching row dropped (value-permuted counts as match)") {
    val tgt = df(Row("2", "1", "4", "3")) // permuted values of row 1 still collide
    val out = IncrementalDedup(batch, tgt).collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("5", "9"))
  }

  test("all match → empty result (reference skips the batch)") {
    assert(IncrementalDedup(batch, batch).count() == 0)
  }

  test("idempotence: filtering twice equals filtering once") {
    val tgt = df(Row("1", "2", "3", "4"))
    val once = IncrementalDedup(batch, tgt)
    val twice = IncrementalDedup(once, tgt)
    assert(once.count() == twice.count())
  }
}
