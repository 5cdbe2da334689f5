package graft

/** `Tables.cutLineage` has two policies: RELIABLE checkpoint (HDFS-class
  * storage, executor-loss-safe — what a cluster configures) when a
  * checkpoint dir is set, `localCheckpoint` (executor-local blocks)
  * otherwise. Every other spec exercises only the local fallback, so
  * the "reliable storage at scale" path was documented but never run —
  * this spec drives real iterative operators under BOTH policies and
  * proves (a) results are bit-identical, (b) the reliable path actually
  * wrote checkpoint data to the configured directory.
  *
  * Ordering note: `setCheckpointDir` is JVM-global and has no unset, so
  * the dir this spec configures persists for later suites — harmless
  * (cutLineage simply keeps using the reliable path over tiny test
  * frames) but worth knowing when reading timings.
  */
class CheckpointPolicySpec extends SparkSpec {

  private def runQuery(name: String): Set[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toSeq).toSet

  test("iterative operators: identical results under local and reliable checkpointing") {
    // setCheckpointDir is JVM-global with no unset; if some earlier
    // suite in this JVM already configured one, the local-fallback leg
    // can't run — CANCEL (the comparison is meaningless), don't fail.
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "a checkpoint dir is already set in this JVM — cannot exercise the local fallback")
    // Two iteration families: pagerank (per-sweep join+agg fixed point)
    // and k-core (peel loop); both route every sweep through cutLineage.
    val localPr = runQuery("graph_pagerank")
    val localKc = runQuery("graph_kcore")

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val reliablePr = runQuery("graph_pagerank")
    val reliableKc = runQuery("graph_kcore")

    assert(reliablePr == localPr, "pagerank diverged across checkpoint policies")
    assert(reliableKc == localKc, "k-core diverged across checkpoint policies")

    // The reliable path must have actually written checkpoint data —
    // otherwise this spec silently tested the fallback twice.
    def fileCount(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
    assert(fileCount(java.nio.file.Paths.get(dir)) > 0,
      s"no checkpoint files under $dir — reliable policy not exercised")
  }
}
