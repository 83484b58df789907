package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected-components clustering over the dup-pair graph by iterative
  * min-label propagation via DataFrame self-joins (the north-star's required
  * clustering stage; the reference stops at pairs, so clusters are our
  * extension — oracle = union-find over the reference's pair CSV,
  * FIXTURES.md §4.4).
  *
  * Algorithm: every node starts labeled with its own id; each round a node
  * takes the min of its label and its neighbors' labels; stop when no label
  * changes. LSH dup-graphs are unions of near-cliques (every bucket emits a
  * clique / star), so the effective diameter is tiny and this converges in
  * 2-4 rounds — the right trade against large-star/small-star's extra
  * shuffles at this graph shape.
  *
  * Each iteration materializes via localCheckpoint to truncate lineage
  * (plan growth is the classic failure of iterative DataFrame jobs); the
  * checkpointed-pipeline runner persists the *final* labels to a real table
  * for resume (SURVEY.md §4 physical-execution checklist).
  */
object ConnectedComponents {

  /** @param pairs   (doc1, doc2) undirected dup edges
    * @param allDocs (doc_id) every document (singletons keep their own id)
    * @return (doc_id, cluster_id) where cluster_id = min doc_id in component
    */
  def cluster(pairs: DataFrame, allDocs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Iterate only over nodes that actually appear in an edge; the (vastly
    // larger) singleton population bypasses the loop entirely and is
    // appended at the end with cluster_id = doc_id. On a dedup graph where
    // dups are a few % of the corpus this shrinks every per-iteration join
    // by 10-100x.
    val edges = pairs
      .select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nodes = edges.select(col("src").as("doc_id")).distinct()

    var labels = nodes
      .select(col("doc_id").cast("long"))
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("neighbor_min"))

      val next = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"),
          (col("neighbor_min").isNotNull && col("neighbor_min") < col("cluster_id"))
            .as("changed")
        )
        .localCheckpoint()

      converged = next.filter(col("changed")).limit(1).isEmpty
      labels = next.select("doc_id", "cluster_id") // next is already materialized
      iter += 1
    }
    edges.unpersist()
    // singletons: every doc not in any pair is its own cluster
    val singletons = allDocs
      .select(col("doc_id").cast("long"))
      .join(nodes, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    labels.union(singletons)
  }
}
