package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) between TWO tables: fuzzy-match
  * rows of A to rows of B by trigram Jaccard over a name column — the
  * cross-catalog "same entity?" join the reference's hash anti-join
  * cannot express (its equality is all-or-nothing; linkage needs
  * set-overlap similarity between DIFFERENT strings).
  *
  * Candidates come from ONE equality join on shared trigrams, counted
  * per pair in the same aggregate (no pair is ever re-verified), then
  * an EXACT integer Jaccard test: `100·|A∩B| ≥ t100·|A∪B|` — counts
  * only, no float division, so any engine agrees bit-for-bit.
  *
  * Scale shape: trigram explode is narrow; the candidate join
  * partitions by trigram (hot trigrams are data skew — AQE splits
  * them, and a stop-trigram cut like [[Dedup]]'s prefix filter applies
  * when catalogs are web-scale); per-id set sizes ride two tiny
  * aggregates joined back by id. Pair work is Σ per-trigram
  * |A|·|B| — never the full A×B cross product.
  */
object Linkage {

  /** (id_a, id_b, n_shared, n_union) for pairs whose DISTINCT-trigram
    * Jaccard ≥ t100/100. Names are lowercased and padded with two
    * spaces on each side (boundary trigrams anchor prefixes/suffixes —
    * the pg_trgm convention).
    */
  def trigramJoin(a: DataFrame, b: DataFrame, idA: String, nameA: String,
      idB: String, nameB: String, t100: Int): DataFrame = {
    require(t100 > 0 && t100 <= 100)
    val ga = grams(a, idA, nameA, "id_a")
    val gb = grams(b, idB, nameB, "id_b")
    val sa = ga.groupBy("id_a").agg(count(lit(1)).as("na"))
    val sb = gb.groupBy("id_b").agg(count(lit(1)).as("nb"))
    val shared = ga.join(gb, "g")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
    shared.join(sa, "id_a").join(sb, "id_b")
      .withColumn("n_union", col("na") + col("nb") - col("n_shared"))
      .where(col("n_shared") * 100 >= col("n_union") * lit(t100))
      .select("id_a", "id_b", "n_shared", "n_union")
  }

  /** Exploded DISTINCT padded trigrams: (outId, g). */
  private def grams(df: DataFrame, idCol: String, nameCol: String,
      outId: String): DataFrame =
    graft.sources.Tables.rebalanceForCompute(df)
      .select(col(idCol).as(outId),
        concat(lit("  "), lower(col(nameCol)), lit("  ")).as("p"))
      .where(col("p").isNotNull)
      .select(col(outId), explode(array_distinct(transform(
        sequence(lit(1), length(col("p")) - 2),
        i => col("p").substr(i, lit(3))))).as("g"))
}
