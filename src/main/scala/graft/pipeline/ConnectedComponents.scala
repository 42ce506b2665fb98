package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation with
  * lineage checkpoints (no GraphFrames jar in the sandbox; SURVEY.md §7.4).
  *
  * labels(id) starts as id; each round every vertex takes the min of its own
  * label and its neighbors' labels; converged when no label changes. Rounds
  * = graph diameter, which for entity-dedup graphs is tiny (dup clusters are
  * near-cliques). localCheckpoint every `checkpointEvery` rounds truncates
  * the lineage so plans don't grow exponentially — the standard alternating
  * small-star/large-star optimization is unnecessary at these diameters but
  * the checkpoint discipline is the same.
  *
  * Input edges (src, dst) strings; returns (id, component) with component =
  * lexicographic min id of the component.
  */
object ConnectedComponents {

  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20, checkpointEvery: Int = 3): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = vertices.select(col("id"), col("id").as("component")).cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbors = bidir
        .join(labels, bidir("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select("id", "component").union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
      val stepped =
        if ((iter + 1) % checkpointEvery == 0) next.localCheckpoint(true) else next.cache()
      val changed = stepped.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels.unpersist(false)
      labels = stepped
      converged = changed == 0
      iter += 1
    }
    bidir.unpersist(false)
    labels
  }
}
