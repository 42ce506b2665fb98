package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Numeric discipline: vectors are cast element-wise to double and the dot
  * product sums in ascending index order (the native `graft_dot`
  * expression — a tight primitive loop, codegen'd; same IEEE result as a
  * sequential left fold), so the result is bit-identical to the DuckDB
  * oracle's `list_sum([a[i]*b[i] ...])` — no tolerance windows in the
  * correctness gate.
  *
  * Scale paths:
  *  - bruteForceTopK: exact; the query side is tiny and broadcast, the
  *    corpus side streams — per-partition top-k via window. This is the
  *    semantics baseline (FAISS IndexFlatIP is itself exact brute force —
  *    /root/reference/services/vectorization.py:516-519).
  *  - ivfTopK: IVF coarse quantizer (Lloyd iterations over the corpus,
  *    centroids collected — model-sized, not data-sized), cell assignment
  *    once per vector, probes restricted to nprobe nearest cells: turns the
  *    all-pairs join into a cell-equi-join, which is the 100TB shape.
  */
object Similarity {

  /** Element-wise double cast. */
  def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Index-order dot product (deterministic association order) via the
    * native codegen'd expression — replaces the
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` spelling, which allocated an
    * intermediate array and ran two lambda evaluators per pair; the fold
    * order is identical so every result is bit-unchanged. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosineCol(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Corpus with precomputed double vector + norm. */
  def prep(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("vec_id"), dvec(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Exact top-k by cosine for each query vector (queries broadcast).
    * Deterministic rank: (cosine desc, vec_id asc). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")))
    val scored = corpus.join(q, col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosineCol(col("qv"), col("v"), col("qn"), col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk").cast("long").as("rnk"), col("cosine"))
  }

  /** Deterministic Lloyd k-means over the prepped corpus. Centroid
    * coordinates are rounded each iteration so float-accumulation order
    * (which varies with partitioning) cannot leak into assignments —
    * output is identical at any parallelism level. Returns (cell ->
    * centroid) as a driver-side model (C*dim doubles: model-sized). */
  def kmeans(corpus: DataFrame, c: Int, iters: Int): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    // the Lloyd loop walks the corpus iters+1 times — cache for its
    // lifetime only, released before returning, UNLESS the caller already
    // persisted it (unpersisting a shared memoized frame here would
    // silently evict it for every later query using it, and the async
    // removal can race with a concurrently running job)
    val ownCache = corpus.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownCache) corpus.persist()
    var centroids: Array[(Int, Array[Double])] =
      corpus.orderBy("vec_id").limit(c).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getAs[Seq[Double]]("v").toArray) }
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignU = udf((v: Seq[Double]) => nearestCell(v.toArray, bc.value))
      val dim = centroids.head._2.length
      val assigned = corpus.withColumn("cell", assignU(col("v")))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      centroids = sums.groupBy(_.getAs[Int]("cell")).toArray.sortBy(_._1).map {
        case (cell, rows) =>
          val arr = new Array[Double](dim)
          rows.foreach { r =>
            // round(6) kills partial-agg association-order noise
            arr(r.getAs[Int]("pos")) =
              math.rint(r.getAs[Double]("s") / r.getAs[Long]("n") * 1e6) / 1e6
          }
          (cell, arr)
      }
    }
    if (ownCache) corpus.unpersist(false)
    centroids
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def nearestCell(v: Array[Double], cents: Array[(Int, Array[Double])]): Int = {
    var best = -1; var bestD = Double.MaxValue
    cents.foreach { case (c, cv) =>
      val d = sqDist(v, cv)
      if (d < bestD || (d == bestD && c < best)) { best = c; bestD = d }
    }
    best
  }

  def nearestCells(v: Array[Double], cents: Array[(Int, Array[Double])], nprobe: Int): Seq[Int] =
    cents.map { case (c, cv) => (sqDist(v, cv), c) }.sortBy(identity).take(nprobe).map(_._2).toSeq

  /** Corpus with a `cell` assignment column for the given IVF model —
    * the index-build step, separable so sessions can build (and persist)
    * it once and serve many top-k queries against it. */
  def ivfAssign(corpus: DataFrame, model: Array[(Int, Array[Double])]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(model)
    val assignU = udf((v: Seq[Double]) => nearestCell(v.toArray, bc.value))
    corpus.withColumn("cell", assignU(col("v")))
  }

  /** IVF top-k over a pre-assigned corpus (`cells` = ivfAssign output):
    * probe the nprobe nearest cells per query, exact cosine within them.
    * The expensive join is an equi-join on `cell` instead of a cross join. */
  def ivfTopKAssigned(cells: DataFrame, model: Array[(Int, Array[Double])],
                      queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val bc = cells.sparkSession.sparkContext.broadcast(model)
    val probeU = udf((v: Seq[Double]) => nearestCells(v.toArray, bc.value, nprobe))
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("cell", explode(probeU(col("qv")))))
    val scored = cells.join(q, "cell").filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosineCol(col("qv"), col("v"), col("qn"), col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk").cast("long").as("rnk"), col("cosine"))
  }

  /** IVF approximate top-k: build the model, assign cells once, query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              c: Int = 8, iters: Int = 3, nprobe: Int = 2): DataFrame = {
    val model = kmeans(corpus, c, iters)
    ivfTopKAssigned(ivfAssign(corpus, model), model, queries, k, nprobe)
  }

  /** Corpus-SELF embedding near-dup pairs via random-hyperplane sign-LSH
    * bucketing + exact-cosine verification — the 100 TB shape for "find all
    * near-duplicate pairs inside the corpus", where the probe-broadcast
    * variant below cannot apply (the probe side IS the corpus) and an
    * all-pairs join is quadratic. Each vector gets `tables` bucket keys of
    * `bits` sign bits (TextSim.lshKeys, the same bank the KG blocking
    * channel uses); candidate pairs share a bucket in ANY table; the exact
    * sequential-fold cosine then keeps pairs >= tau.
    *
    * Recall math (per-table collision p = (1 - acos(cos)/pi)^bits):
    * at cos = 0.99, p = 0.955^16 ~= 0.479, so the 12-table miss probability
    * is (1-0.479)^12 ~= 4e-4 per pair — pairs AT the tau boundary can
    * occasionally be missed and the operator is honestly approximate there.
    * The exact-equality gates (DuckDB twin, OperatorsSpec) are sound because
    * their planted pairs sit at cos ~= 0.999, where p ~= 0.986^16 ~= 0.795
    * and the miss probability is (1-0.795)^12 ~= 6e-9 per pair. Doubling the
    * tables (6 -> 12) doubles a tiny bucket-join cost, not a quadratic one,
    * because buckets stay small: only
    * near-identical vectors agree on 16 sign bits. */
  def lshNearDupPairs(corpus: DataFrame, tau: Double,
                      tables: Int = 12, bits: Int = 16): DataFrame = {
    val keys = udf((v: Seq[Double]) =>
      graft.core.TextSim.lshKeys(v.map(_.toFloat).toArray, tables, bits))
    // band ids only (8-byte shuffle rows, not vectors); vectors rejoin for
    // the candidate pairs alone — at corpus scale the bucket join's shuffle
    // bytes, not the cosine flops, are the cost
    val banded = corpus.select(col("vec_id"), explode(keys(col("v"))).as("bucket"))
    val cand = banded.toDF("vec_a", "bucket")
      .join(banded.toDF("vec_b", "bucket"), "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    cand
      .join(corpus.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), "vec_b")
      .withColumn("cosine", cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cosine") >= tau)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Within-cell near-dup pairs (vec_a < vec_b, cosine >= tau) — the
    * SemDeDup candidate enumeration: ONE equi-join on the quantizer cell,
    * so pair fan-out is bounded by cell occupancy, never corpus². Input is
    * an `ivfAssign` output (vec_id, v, nrm, cell). */
  def semanticPairs(assigned: DataFrame, tau: Double): DataFrame =
    assigned.select(col("cell"), col("vec_id").as("vec_a"),
        col("v").as("va"), col("nrm").as("na"))
      .join(assigned.select(col("cell"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nb")), "cell")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cosine") >= tau)
      .select("vec_a", "vec_b", "cosine")

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the deterministic k-means
    * coarse quantizer, enumerate candidate pairs only WITHIN a cell
    * (cosine >= tau over the exact sequential-fold dot), connect them
    * transitively, and keep the min-id representative per semantic
    * cluster. Cluster-then-prune is what makes semantic dedup tractable at
    * 100 TB: the candidate join is cell-local (occupancy-bounded), the
    * quantizer model is driver-sized, and the cluster graph is dup-sized.
    * A near-dup pair split across cells is missed BY DESIGN — the paper's
    * accepted approximation; raise the cell count/iters, or use
    * `lshNearDupPairs` when bucket-union recall is needed.
    *
    * Returns every input row as (vec_id, cell, kept), kept = not a
    * non-representative member of some semantic cluster. Deterministic end
    * to end: the model is parallelism-independent, assignment ties go to
    * the lowest cell, representatives are cluster minima. */
  def semanticDedup(assigned: DataFrame, tau: Double): DataFrame = {
    // the assignment plan is walked THREE times (both sides of the cell
    // self-join + the final keep projection) — materialize it once (r7
    // ADVICE): an eager localCheckpoint computes the distance-to-every-
    // centroid assignment a single time and severs the upstream lineage;
    // the blocks are freed by the ContextCleaner once the frame is
    // unreachable. Values are untouched — assignment is deterministic.
    val a = assigned.localCheckpoint(true)
    val pairs = semanticPairs(a, tau)
    val nonReps = Dedup.clusterReps(
        pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as("vec_id"), lit(false).as("kept"))
    a.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(nonReps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Embedding-cosine near-dup pairs between a (small, broadcast) probe set
    * and the corpus. */
  def cosineNearDup(corpus: DataFrame, probes: DataFrame, tau: Double): DataFrame =
    corpus.join(
        broadcast(probes.select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))),
        col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosineCol(col("pv"), col("v"), col("pn"), col("nrm")))
      .filter(col("cosine") >= tau)
      .select("probe_id", "vec_id", "cosine")
}
