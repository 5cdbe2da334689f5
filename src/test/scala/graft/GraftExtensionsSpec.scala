package graft

import graft.GraftExtensions

/** The custom expressions must be reachable from plain SQL after
  * registration — the surface a SQL-only user of the engine sees.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft functions callable from spark.sql") {
    GraftExtensions.register(spark)
    val hash = spark.sql("SELECT graft_row_hash('1', '2', '3', '4') AS h")
      .first().getString(0)
    assert(hash == "81dc9bdb52d04dc20036dbd8313ed055") // md5("1234")

    val dot = spark.sql(
      "SELECT float_vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .first().getDouble(0)
    assert(dot == 11.0)

    val c = spark.sql(
      "SELECT sorted_long_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c")
      .first().getInt(0)
    assert(c == 2)

    // J = 2/4 = 0.5: passes t=0.5, fails t=0.6 (early exit → -1)
    val j = spark.sql(
      "SELECT sorted_long_jaccard_ge(array(1L, 2L, 5L), array(2L, 3L, 5L), 0.5D) AS j")
      .first().getDouble(0)
    assert(j == 0.5)
    val jf = spark.sql(
      "SELECT sorted_long_jaccard_ge(array(1L, 2L, 5L), array(2L, 3L, 5L), 0.6D) AS j")
      .first().getDouble(0)
    assert(jf == -1.0)
    // decomposed e + combining acute composes under NFC
    val decomposed = "cafe\u0301"
    val nfc = spark.sql(s"SELECT graft_nfc_normalize('$decomposed') AS s")
      .first().getString(0)
    assert(nfc == "caf\u00e9" && nfc.length == 4)
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.TopKStrategy) == 1)
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.RegexPrefixRewrite) == 1)
    assert(spark.sql("SELECT graft_row_hash('x') IS NOT NULL AS ok").first().getBoolean(0))
  }

  test("anchored literal RLIKE rewrites to string predicates, results unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    // A parquet-backed frame: a local relation would be constant-folded
    // whole (ConvertToLocalRelation), leaving no predicate to inspect.
    val df = graft.sources.Tables.load(spark, sf0001, "part")
      .select(col("p_brand").as("s"))

    def optimized(pattern: String): String =
      df.where(col("s").rlike(pattern)).queryExecution.optimizedPlan.toString

    // ^lit → StartsWith, lit → Contains
    assert(optimized("^Brand#1").contains("StartsWith") &&
      !optimized("^Brand#1").contains("RLIKE"))
    assert(optimized("and#").contains("Contains"))
    // metacharacters must NOT rewrite — semantics would change
    assert(optimized("^Brand#[0-9]").contains("RLIKE"))
    assert(optimized("^Brand#1+").contains("RLIKE"))
    // '$'-anchored patterns must NOT rewrite: Java '$' matches before a
    // final line terminator, endswith/= do not ("abc$" matches "abc\n")
    assert(optimized("#1x$").contains("RLIKE"))
    assert(optimized("^Brand#1$").contains("RLIKE"))

    // results identical to the un-rewritten regex on every shape
    for (p <- Seq("^Brand#1", "and#", "")) {
      val got = df.where(col("s").rlike(p)).as[String].collect().toSet
      val expected = df.as[String].collect()
        .filter(s => java.util.regex.Pattern.compile(p).matcher(s).find())
        .toSet
      assert(got == expected, s"pattern $p")
    }
  }
}
