package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster canonicalization: near-dup detection yields PAIRS;
  * deduplication needs CLUSTERS (connected components of the pair graph)
  * so each family keeps exactly one canonical document.
  *
  * Min-label propagation: every node starts labeled with its own id and
  * repeatedly takes the minimum label among itself and its neighbors —
  * the classic large-graph CC algorithm (what GraphX/GraphFrames run),
  * expressed in DataFrames. Converges in O(component diameter)
  * iterations; near-dup families are shallow (diameter ≤ 3-4 in
  * practice), and `maxIter` bounds pathological chains. Each iteration
  * is one join + one aggregation, both partitioned by node id;
  * `localCheckpoint` truncates the growing lineage so the loop doesn't
  * re-execute history.
  */
object Clusters {

  /** Connected components of an undirected pair graph.
    * Input: (id_a, id_b) edges. Output: (id, cluster_id) for every node
    * that appears in at least one pair, cluster_id = min id reachable.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("id"))
        .agg(min("label").as("nlabel"))
      val updated = labels.withColumnRenamed("label", "old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"),
          col("old"))
        .localCheckpoint(true)
      converged = updated.where(col("label") =!= col("old")).isEmpty
      labels = updated.select("id", "label")
      i += 1
    }
    edges.unpersist()
    // Unconverged labels are WRONG (a node may point at an id that itself
    // migrated to a lower cluster), and a wrong cluster_id silently breaks
    // keeper selection downstream — fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations " +
        s"(component diameter exceeds maxIter); raise maxIter")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Full dedup-cluster assignment for a text corpus: MinHash near-dup
    * pairs → components → (doc, cluster, is_keeper). Documents in no
    * pair are their own singleton cluster.
    */
  def dedupClusters(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol, threshold = threshold)
    val comps = connectedComponents(pairs.select("id_a", "id_b"))
    docs.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("is_keeper", (col(idCol) === col("cluster_id")).cast("boolean"))
  }
}
