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

  /** Size-adaptive entry point. The canonicalization graph is dictionary-
    * scale (entity ids + created-surface ids), NOT corpus-scale — at any
    * transcript volume it stays orders of magnitude below the corpus — so
    * below `driverThreshold` rows the component labeling runs as a single
    * driver-local union-find (two jobs total) instead of an iterative
    * join loop (dozens of barrier-synced jobs whose fixed latency dominates
    * and does not parallelize). The distributed loop remains the fallback
    * for genuinely huge dictionaries. */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
          checkpointEvery: Int = 3, driverThreshold: Long = defaultDriverThreshold): DataFrame = {
    val vs = vertices.select(col("id")).persist()
    val es = edges.select(col("src"), col("dst")).persist()
    val size = vs.count() + es.count()
    val out =
      if (size <= driverThreshold) runDriver(vs, es)
      else runDistributed(vs, es, maxIter, checkpointEvery)
    // runDriver has collected; runDistributed caches its labels — either
    // way the inputs are no longer needed (a cache miss just recomputes)
    vs.unpersist(false)
    es.unpersist(false)
    out
  }

  /** Driver fast-path ceiling derived from the actual driver heap: ~2M rows
    * per 8 GiB (strings + Row boxing + the union-find map comfortably fit),
    * capped at 2M — collecting 5M rows onto an 8g driver risked OOM near the
    * old constant threshold. */
  def defaultDriverThreshold: Long =
    math.min(2000000L, Runtime.getRuntime.maxMemory() / 4096)

  private def runDriver(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val vs = vertices.collect().map(_.getString(0))
    val es = edges.collect().map(r => (r.getString(0), r.getString(1)))
    graft.core.UnionFind.components(vs, es).toSeq.sortBy(_._1)
      .toDF("id", "component")
  }

  def runDistributed(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
                     checkpointEvery: Int = 3, onRounds: Int => Unit = _ => ()): DataFrame = {
    // SEVER the input lineage before iterating (localCheckpoint, not cache):
    // caching truncates execution but NOT analysis — every round's plan
    // still embeds the producer's full logical plan (scoring UDFs, blocking
    // joins, ...), and the union in the loop doubles those embeddings per
    // round, so driver-side re-analysis grew 2^k with real pipeline inputs
    // (measured: rounds of 4.7s -> 16s -> 24s at 17k vertices where the
    // same loop over LocalTableScan inputs takes 3s total — CcBench found
    // this; after severing, rounds are flat ~1s). The per-round
    // checkpointEvery discipline below bounds the loop's OWN growth.
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("component")).localCheckpoint(true)
    var iter = 0
    var converged = false
    val dbg = sys.env.get("GRAFT_CC_DEBUG").contains("1")
    var tPrev = System.nanoTime()
    if (dbg) { bidir.count(); System.err.println(f"[cc] bidir ${(System.nanoTime()-tPrev)/1e9}%.2fs"); tPrev = System.nanoTime() }
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
      if (dbg) { System.err.println(f"[cc] round $iter ${(System.nanoTime()-tPrev)/1e9}%.2fs changed=$changed"); tPrev = System.nanoTime() }
    }
    bidir.unpersist(false)
    onRounds(iter)
    labels
  }
}
