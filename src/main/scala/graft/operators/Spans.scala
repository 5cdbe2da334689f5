package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Exact duplicate-SPAN detection and removal — substring-level dedup.
  *
  * Document-level dedup (exact / MinHash / SimHash, [[Dedup]]) misses the
  * common web-corpus pathology where *parts* of documents repeat: shared
  * boilerplate, quoted passages, templated intros. The published remedy
  * (suffix-array substring dedup, "Deduplicating Training Data Makes
  * Language Models Better", Lee et al. 2022) finds verbatim token runs of
  * length ≥ k that occur more than once in the corpus and removes all but
  * one occurrence. A literal distributed suffix array is impractical on
  * Spark; the equivalent fixed-k formulation is: hash every k-token gram
  * WITH its position, keep grams seen in ≥ `minDocs` distinct documents,
  * and merge overlapping duplicated gram starts into maximal spans — any
  * duplicated run of length L ≥ k is exactly covered by its L-k+1
  * duplicated k-grams, so merged spans equal the maximal duplicated
  * substrings of length ≥ k (restricted to cross-document repeats).
  *
  * Scale shape (100 TB): gram table = one narrow posexplode (no shuffle);
  * duplicated-gram detection = one partial-agg shuffle on the 64-bit gram
  * hash; position recovery = shuffled hash join back on the hash (AQE
  * splits skewed boilerplate grams); span merge = one per-document window
  * (shuffle on doc id, bounded by document length). The pair space of
  * occurrences is never enumerated and nothing touches the driver.
  */
object Spans {

  /** (id, pos, h): the 60/64-bit hash of each k-token gram with its
    * 1-based starting token position. Documents shorter than k tokens
    * contribute no rows.
    */
  private def gramPositions(df: DataFrame, idCol: String, textCol: String,
      k: Int, hashFn: Column => Column): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("T"))
      .where(size(col("T")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("T")) - (k - 1)),
        i => concat_ws(" ", slice(col("T"), i, lit(k))))).as(Seq("p0", "g")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"),
        hashFn(col("g")).as("h"))

  /** Maximal cross-document duplicated token spans of length ≥ k.
    *
    * Output: (doc_id, span_start, span_end, span_tokens), token positions
    * 1-based inclusive, one row per maximal span. Two duplicated gram
    * starts ≤ k apart overlap or touch, so they merge into one span
    * (classic gaps-and-islands on the start positions).
    *
    * `hashFn` defaults to the oracle-checkable md5-derived 60-bit hash;
    * production uses `xxhash64(_)` (same plan, cheaper hash). A hash
    * collision could fuse two distinct grams — negligible at 60 bits and
    * irrelevant to the span algebra (collisions only ADD candidate
    * starts, verified use cases re-check text downstream).
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minDocs: Int = 2,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    val gp = gramPositions(df, idCol, textCol, k, hashFn)
    val dup = gp.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select("h")
    val hits = gp.join(dup, "h").select("id", "pos")
    val w = Window.partitionBy("id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) <= k, 0).otherwise(1))
      .withColumn("island", sum("brk").over(w))
      .groupBy(col("id"), col("island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + (k - 1)).as("span_end"))
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Remove duplicated k-gram occurrences, keeping one canonical copy.
    *
    * For every gram hash seen in ≥ `minDocs` distinct documents, the
    * occurrence with the lexicographically smallest (doc id, position)
    * is canonical; every other occurrence marks its k token positions
    * covered, and covered tokens are dropped from the document. This is
    * the removal side of Lee et al. 2022 at gram granularity: a repeated
    * passage survives exactly once (in its first document) and is
    * stripped everywhere else. Canonical-gram tokens can still be
    * clipped by a DIFFERENT overlapping duplicated gram — gram-level
    * marking is deterministic, order-free, and errs toward removal,
    * which is the safe side for training data.
    *
    * Output: (doc_id, clean_text, n_kept, n_removed) for every input
    * document (short/unique documents pass through unchanged).
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minDocs: Int = 2,
      hashFn: Column => Column = TextOps.md5Hash60): DataFrame = {
    val gp = gramPositions(df, idCol, textCol, k, hashFn)
    val agg = gp.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"),
        min(struct(col("id"), col("pos"))).as("keep"))
      .where(col("nd") >= minDocs)
    // Covered token positions: the k positions under every non-canonical
    // occurrence. Bounded explode (k × duplicated occurrences), distinct
    // collapses overlaps before the position join.
    val covered = gp.join(agg, "h")
      .where(!(col("id") === col("keep.id") && col("pos") === col("keep.pos")))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .distinct()
    val toks = df
      .select(col(idCol).as("id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).cast("long").as("tp"), col("tok"))
    val keptAgg = toks.join(covered, Seq("id", "tp"), "left_anti")
      .groupBy("id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .join(keptAgg.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
