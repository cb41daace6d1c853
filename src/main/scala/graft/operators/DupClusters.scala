package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate clustering: connected components over near-duplicate pairs,
  * assigning every involved document the MINIMUM doc id of its component —
  * the canonical-document selection step that turns pairwise near-dup
  * output ([[NearDup]], [[Similarity.cosineNearDupPairs]]) into "keep this
  * one, drop those".
  *
  * Hash-to-min label propagation: every node starts labeled with itself;
  * each round pushes labels one hop across edges and keeps the per-node
  * minimum, so convergence takes component-diameter rounds — near-dup
  * components are shallow (docs linked through shared shingles), so a few
  * rounds settle it even at corpus scale. Each round is one equality join
  * + one min-aggregation (map-side combinable) over (id, label) pairs
  * only. Rounds are cut off with an EAGER localCheckpoint: persist alone
  * truncates recomputation but NOT lineage, and the logical plan of an
  * iterated frame otherwise grows a join+agg layer per round until
  * analysis itself dominates (the classic iterative-Spark trap).
  */
object DupClusters {

  /** `edges` needs columns (id_a, id_b). Returns (id, cluster_id) for every
    * id appearing in an edge; docs with no near-dup pair are their own
    * implicit singleton cluster and are not emitted. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(edges.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed with min(self, direct neighbors) — propagation round zero fused
    // into the init aggregation; diameter-1 components (plain duplicate
    // pairs, the overwhelming majority) then converge after one check.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(least(col("src").as("id"), min(col("dst"))).as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("cluster_id"))
        .union(labels.select(col("id"), col("cluster_id")))
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true) // eager: truncates the per-round lineage
      converged = prop.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .isEmpty
      labels = prop
      i += 1
    }
    sym.unpersist(false)
    labels
  }
}
