package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel
import graft.functions.TextOps

/** Byte-pair-encoding merge induction — the tokenizer-TRAINING side of
  * a training-data pipeline (Sennrich et al. 2016, public algorithm):
  * start every word as its character sequence, then repeatedly merge
  * the corpus-globally most frequent ADJACENT symbol pair into one
  * symbol. The learned merge list (rank, left, right) IS the tokenizer.
  *
  * Scale design: BPE statistics depend only on the VOCABULARY — the
  * (distinct word, frequency) table — so the corpus collapses after one
  * hash aggregation and every iteration then runs on a table bounded by
  * |vocab|, not corpus rows. Per merge round: one narrow pair-explode +
  * one partial-aggregated groupBy + a 1-row TakeOrdered to the driver
  * (the argmax pair — the only driver traffic), then a narrow
  * `replace` map applies the merge. No window over a single partition,
  * no driver-side vocabulary.
  *
  * Symbol sequences are encoded as ONE string per word with every
  * symbol wrapped in single spaces (`"low"` → `" l  o  w "`): the pair
  * (a, b) is adjacent iff `" a  b "` occurs as a substring, and a
  * single left-to-right non-overlapping `replace(repr, " a  b ", " ab ")`
  * applies the merge in exactly BPE's greedy-leftmost order (`"aaaa"`
  * merges to `aa aa`, `"aaa"` to `aa a`). The space delimiter can never
  * collide: words are whitespace-split tokens. This encoding is what
  * makes the whole training loop replayable by an external SQL oracle —
  * `replace` has identical semantics in every engine.
  *
  * Words are restricted to `[a-z0-9]+` (post-lowercasing): merges are
  * customarily trained on a cleaned subset, and the restriction keeps
  * the character alphabet identical across engines (code-unit vs
  * code-point splitting diverges on astral-plane text).
  */
object Bpe {

  private val outSchema = StructType(Seq(
    StructField("merge_rank", IntegerType, nullable = false),
    StructField("sym_a", StringType, nullable = false),
    StructField("sym_b", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** ` a  b  c `-encoded symbol string of a word. */
  private def reprOf(word: org.apache.spark.sql.Column) =
    concat(lit(" "),
      concat_ws("  ", filter(split(word, ""), c => c =!= "")), lit(" "))

  /** First `numMerges` BPE merges learned from `textCol`:
    * (merge_rank, sym_a, sym_b, pair_count). Ties in pair frequency
    * break on (sym_a, sym_b) ascending — deterministic under any
    * partitioning because counts are exact integers.
    */
  def merges(df: DataFrame, textCol: String, numMerges: Int = 4): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(reprOf(col("w")).as("repr"), col("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var words = vocab
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var done = false
      for (rank <- 1 to numMerges if !done) {
        val syms = split(trim(col("repr")), "  ")
        val top = words
          .select(col("c"), syms.as("s"))
          .where(size(col("s")) >= 2)
          .select(col("c"), explode(zip_with(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("c").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        top.headOption match {
          case None => done = true // alphabet exhausted (vocab of 1-char words)
          case Some((a, b, cnt)) =>
            out += Row(rank, a, b, cnt)
            words = words.withColumn("repr",
              replace(col("repr"), lit(s" $a  $b "), lit(s" $a$b ")))
        }
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1), outSchema)
    } finally vocab.unpersist()
  }

  /** Apply a learned merge list to the corpus — the tokenizer-APPLY side:
    * per document, the `[a-z0-9]+` word count and the BPE symbol count
    * after replaying `mergesDf`'s merges in rank order. The per-document
    * `n_tokens / n_words` ratio is the compression diagnostic used to
    * pick tokenizer budgets.
    *
    * Scale shape: the merge list is tiny by construction (it IS the
    * tokenizer — thousands of rows at most) and is collected once to the
    * driver, where it unrolls into a chain of `replace` calls inside ONE
    * narrow codegen'd projection — no join, no shuffle, no per-row state.
    * Documents are encoded with the same space-anchored symbol-string
    * representation as training (see class doc): words join with a
    * newline so no merge pattern (always `" a  b "`) can span a word
    * boundary.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val ms = mergesDf.select("merge_rank", "sym_a", "sym_b")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val words = filter(TextOps.tokens(col(textCol)),
      t => t.rlike("^[a-z0-9]+$"))
    val repr0 = concat_ws("\n", transform(words, w => reprOf(w)))
    val encoded = ms.foldLeft(repr0) { case (r, (a, b)) =>
      replace(r, lit(s" $a  $b "), lit(s" $a$b "))
    }
    df.select(col(idCol), words.as("__w"), encoded.as("__r"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_words"),
        size(filter(split(col("__r"), " "),
          x => x =!= "" && x =!= "\n")).cast("long").as("n_tokens"))
  }
}
