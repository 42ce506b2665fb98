package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Scale evidence for the iterative + analytic graph layer: a deterministic
  * synthetic scale-free-ish graph far larger than any co-mention graph the
  * sf fixtures produce, with
  *
  *  - pageRankFp: per-iteration wall + the determinism claim checked the
  *    hard way — ranks under a hostile repartitioning must be BIT-EQUAL
  *    (fixed-point arithmetic makes that exact, not approximate);
  *  - pageRankWeightedFp: hash-derived weights 1..20 — wall, the bit-exact
  *    repartitioning check, and the at-scale equivalence referee (uniform
  *    weights must reproduce pageRankFp's ranks bit-for-bit);
  *  - pageRankDirected: the dangling-mass general form on a directed
  *    variant with ~10% pure sinks — wall + exact mass conservation
  *    (total == scale minus bounded truncation loss);
  *  - triangleCounts: wall at >=10M undirected edges, the wedge-join row
  *    count the arboricity bound predicts (Σ_src C(outdeg, 2), from the
  *    same orientEdges invariant the operator uses), and a SAMPLED REFEREE:
  *    for 200 hash-chosen nodes of degree <= 64, per-node triangle counts
  *    recomputed independently (driver-side neighbor pairs, closure checked
  *    by one semi-join) must match exactly. The degree cap keeps the
  *    referee itself non-quadratic; hub correctness is separately pinned by
  *    the sf0.1 DuckDB twin and the orientation-independence spec.
  *  - neighborSimilarity: wall at the same scale with the maxDegree hub cap
  *    (the web-scale configuration), and a sampled referee — up to 100
  *    output pairs re-verified driver-side from collected capped neighbor
  *    sets (same long-division spelling, so equality is exact);
  *  - ConnectedComponents.runDistributed: the canonicalization workhorse at
  *    >=10M edges — wall + rounds-to-convergence, an edge-consistency
  *    referee (0 edges may cross labels), a root referee (every label must
  *    label itself), and the bit-exact hostile-repartitioning check (the
  *    min-label fixpoint is unique);
  *  - GraphOps.kCore: peel rounds + wall at the same scale, an induced
  *    referee (recounting degrees over the original edges semi-joined on
  *    the core nodes must reproduce every core_deg), the k-invariant, and
  *    the bit-exact hostile-repartitioning check (the k-core is unique);
  *  - GraphOps.bfsDistances: frontier expansion from 3 hub seeds — wall,
  *    reach, and the four BFS level axioms as exact referees (seeds at 0,
  *    adjacent labels differ by <= 1, no labeled->unlabeled edge below the
  *    depth cap, every d > 0 node has a d-1 neighbor), plus the bit-exact
  *    hostile-repartitioning check (BFS levels are unique).
  *
  * Graph: `nEdges` undirected edges over `nNodes` nodes; endpoint draws
  * come from xxhash64 so the edge list is reproducible anywhere. The dst
  * draw is taken modulo a hash-derived prefix size, which skews attachment
  * toward low node ids — a long-tailed degree distribution (hub nodes),
  * the shape real entity graphs have and the shape that stresses the
  * contribution aggregate's hot keys.
  *
  * args: [cores] [nNodes] [nEdges] [iters] [simTau]
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val nNodes = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nEdges = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val iters = args.lift(3).map(_.toInt).getOrElse(5)
    val simTau = args.lift(4).map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rawPairs(parts: Int): DataFrame =
      // (a_i, b_i): a uniform, b skewed to low ids by drawing modulo a
      // hash-chosen power-of-two window (deterministic hubs)
      spark.range(0, nEdges, 1, parts)
        .withColumn("a", pmod(xxhash64(col("id"), lit(1)), lit(nNodes)))
        .withColumn("w", pow(lit(2.0), (pmod(xxhash64(col("id"), lit(2)), lit(20)) + 1).cast("double")).cast("long"))
        .withColumn("b", pmod(xxhash64(col("id"), lit(3)), least(lit(nNodes), col("w"))))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"))

    def edges(parts: Int): DataFrame = {
      val e = rawPairs(parts)
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val e = edges(cores.toInt).persist()
    val (nE, tBuild) = time(e.count())

    if (sys.env.contains("GRAFT_EXPLAIN")) {
      val p = GraphOps.pageRankFp(e, 1).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      System.err.println(p.take(6000))
    }

    val (ranks, tRank) = time {
      val r = GraphOps.pageRankFp(e, iters).persist()
      r.count(); r
    }
    val nNodesActual = ranks.count()
    val mass = ranks.agg(sum("rank_fp")).head.getLong(0)
    val perIter = tRank / iters
    val edgeJoinsPerSec = nE.toDouble * iters / tRank

    // determinism across partitioning: same graph at a hostile layout must
    // produce the SAME 64-bit rank for every node
    val (mismatches, tCheck) = time {
      val r2 = GraphOps.pageRankFp(e.repartition(7), iters)
      ranks.join(r2.withColumnRenamed("rank_fp", "r2"), "ent")
        .filter(col("rank_fp") =!= col("r2")).count()
    }

    // ---- WEIGHTED PageRank: hash-derived per-edge weights 1..20 (wall +
    // the bit-exact hostile-repartitioning check), plus the at-scale
    // equivalence referee — with ALL weights 1, pageRankWeightedFp must
    // reproduce the unweighted ranks above bit-for-bit ((r*w) div (w*deg)
    // == r div deg at constant w; spec-pinned small, verified here at 19M
    // edges).
    val eW = e.withColumn("w",
      pmod(xxhash64(col("src"), col("dst"), lit(7)), lit(20L)) + 1L).persist()
    eW.count()
    val (wRanks, tWRank) = time {
      val r = GraphOps.pageRankWeightedFp(eW, iters).persist()
      r.count(); r
    }
    val (wMismatches, tWCheck) = time {
      val r2 = GraphOps.pageRankWeightedFp(eW.repartition(7), iters)
      wRanks.join(r2.withColumnRenamed("rank_fp", "r2"), "ent")
        .filter(col("rank_fp") =!= col("r2")).count()
    }
    val wUniformMismatches = {
      val u = GraphOps.pageRankWeightedFp(e.withColumn("w", lit(1L)), iters)
      ranks.join(u.withColumnRenamed("rank_fp", "ru"), "ent")
        .filter(col("rank_fp") =!= col("ru")).count()
    }
    wRanks.unpersist(false)
    eW.unpersist(false)

    // ---- DIRECTED PageRank with dangling mass: drop every out-edge of
    // nodes with id % 10 == 0 — they keep their in-edges and become pure
    // sinks (~10% of nodes), the exact shape pageRankFp's symmetric
    // contract rejects. Mass must still land at scale minus truncation.
    val directed = e.filter(pmod(col("src"), lit(10L)) =!= 0L).persist()
    val (nDirE, _) = time(directed.count())
    val ((dirNodes, dirMass), tDir) = time {
      val r = GraphOps.pageRankDirected(directed, iters).persist()
      val n = r.count()
      val m = r.agg(sum("rank_fp")).head.getLong(0)
      r.unpersist(false)
      (n, m)
    }
    directed.unpersist(false)

    // ---- triangles at scale: canonical a<b edge list from the same graph
    val und = e.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).persist()
    val nUnd = und.count()
    // the wedge-join row count the arboricity bound predicts (and the
    // operator actually enumerates): Σ_src C(outdeg, 2) over the
    // degree-ordered orientation
    val wedgesPredicted = GraphOps.orientEdges(und)
      .groupBy("src").agg(count(lit(1)).as("d"))
      .agg(sum(expr("d * (d - 1) div 2"))).head.getLong(0)
    val (tri, tTri) = time {
      val t = GraphOps.triangleCounts(und).persist()
      t.count(); t
    }
    val triTotal = tri.agg(sum("n_triangles")).head.getLong(0) / 3

    // sampled referee: 200 hash-chosen nodes of degree <= 64, counts
    // recomputed independently (neighbor pairs on the driver, closure via
    // one join) — cap reported, not silent; hub correctness is pinned by
    // the sf0.1 exact twin + the orientation-independence spec
    val refCap = 64L
    val (refMismatches, nRef) = {
      import spark.implicits._
      val deg = und.select(col("a").as("ent")).unionByName(und.select(col("b").as("ent")))
        .groupBy("ent").agg(count(lit(1)).as("deg"))
      val sample = deg.filter(col("deg") <= refCap)
        .orderBy(xxhash64(col("ent")), col("ent")).limit(200)
        .select("ent").as[Long].collect().toSet
      val sampleB = spark.sparkContext.broadcast(sample)
      val nbrs = und.filter(col("a").isin(sample.toSeq: _*) || col("b").isin(sample.toSeq: _*))
        .flatMap { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          Seq(a -> b, b -> a).filter { case (v, _) => sampleB.value(v) }
        }.collect().groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      val candPairs = nbrs.toSeq.flatMap { case (v, ns) =>
        val s = ns.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.size) yield (v, s(i), s(j))
      }
      val closed = candPairs.toDF("v", "x", "y")
        .join(und, col("x") === col("a") && col("y") === col("b"), "left_semi")
        .groupBy("v").agg(count(lit(1)).as("n_ref"))
        .as[(Long, Long)].collect().toMap
      val engine = tri.filter(col("ent").isin(sample.toSeq: _*))
        .as[(Long, Long)].collect().toMap
      val bad = sample.count(v =>
        engine.getOrElse(v, 0L) != closed.getOrElse(v, 0L))
      (bad, sample.size)
    }
    tri.unpersist(false)

    // ---- neighborhood similarity at scale, hub-capped (the web-scale
    // configuration; the cap is the operator's named approximation)
    val simCap = 64L
    val (sim, tSim) = time {
      val s = GraphOps.neighborSimilarity(und, simTau, maxDegree = Some(simCap)).persist()
      s.count(); s
    }
    val nSim = sim.count()
    // sampled referee: up to 100 output pairs re-verified from collected
    // capped neighbor sets (identical long-division spelling => exact)
    val simMismatches = {
      import spark.implicits._
      val pairs = sim.orderBy("entity_a", "entity_b").limit(100)
        .select("entity_a", "entity_b", "jaccard")
        .as[(Long, Long, Double)].collect()
      if (pairs.isEmpty) 0L
      else {
        val ids = pairs.flatMap(p => Seq(p._1, p._2)).toSet
        val nbrs0 = und.select(col("a").as("ent"), col("b").as("nbr"))
          .unionByName(und.select(col("b").as("ent"), col("a").as("nbr")))
        val degAll = nbrs0.groupBy("nbr").agg(count(lit(1)).as("df"))
        val capped = nbrs0.join(degAll.filter(col("df") <= simCap), "nbr")
          .filter(col("ent").isin(ids.toSeq: _*))
          .select("ent", "nbr").as[(Long, Long)].collect()
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
        pairs.count { case (a, b, j) =>
          val (na, nb) = (capped.getOrElse(a, Set.empty), capped.getOrElse(b, Set.empty))
          val inter = na.intersect(nb).size.toLong
          val expect = inter.toDouble / (na.size.toLong + nb.size.toLong - inter)
          expect != j
        }.toLong
      }
    }
    sim.unpersist(false)

    // ---- connected components at scale: the canonicalization workhorse
    // (dedup clustering / sameAs resolution) on the same graph. The sf0.1
    // recursive-CTE twin pins exact semantics; here the DISTRIBUTED
    // min-label loop is measured at >=10M edges and checked three ways:
    // (1) invariant referee — no edge may cross labels (a violating edge
    //     would mean a split component),
    // (2) root referee — every emitted label must label ITSELF (min-label
    //     propagation converges to the component's min id, which is a root),
    // (3) determinism — the converged fixpoint (min reachable id per node)
    //     is unique, so a hostile repartitioning must reproduce every label
    //     bit-for-bit, exactly like the PageRank check above.
    import graft.pipeline.ConnectedComponents
    val ccVerts = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id"))).distinct()
    val ccEdges = und.select(col("a").as("src"), col("b").as("dst"))
    var ccRounds = 0
    val (cc, tCc) = time {
      val c = ConnectedComponents.runDistributed(
        ccVerts, ccEdges, maxIter = 50, onRounds = r => ccRounds = r).persist()
      c.count(); c
    }
    val nComponents = cc.select("component").distinct().count()
    val ccEdgeViolations = und
      .join(cc.select(col("id").as("a"), col("component").as("ca")), "a")
      .join(cc.select(col("id").as("b"), col("component").as("cb")), "b")
      .filter(col("ca") =!= col("cb")).count()
    val ccNonRootLabels = cc.select(col("component").as("id")).distinct()
      .join(cc, "id")
      .filter(col("component") =!= col("id")).count()
    val (ccMismatches, tCcCheck) = time {
      val c2 = ConnectedComponents.runDistributed(
        ccVerts.repartition(7), ccEdges.repartition(5), maxIter = 50)
      val bad = cc.join(c2.withColumnRenamed("component", "c2"), "id")
        .filter(col("component") =!= col("c2")).count()
      ConnectedComponents.releaseResult(c2)
      bad
    }
    ConnectedComponents.releaseResult(cc)
    cc.unpersist(false)

    // ---- k-core peeling at scale: the dense-subgraph prune on the same
    // graph (k = 8 bites on the long-tailed degree distribution). Checked
    // three ways: (1) induced referee — the reported core must BE the
    // induced subgraph on its node set: semi-joining the ORIGINAL edges on
    // the core nodes and recounting per-node degrees must reproduce every
    // core_deg exactly (peeling may only remove edges whose endpoint left);
    // (2) the k-invariant — no reported degree may be < k; (3) determinism
    // — the k-core is unique, so hostile repartitioning must reproduce it
    // bit-for-bit.
    val kcK = 8
    val kcSym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    var kcRounds = 0
    val (kcore, tKc) = time {
      val c = GraphOps.kCore(kcSym, kcK, onRounds = r => kcRounds = r).persist()
      c.count(); c
    }
    val kcNodes = kcore.count()
    val kcBelowK = kcore.filter(col("core_deg") < kcK).count()
    val kcCoreSet = kcore.select(col("ent"))
    val induced = kcSym
      .join(kcCoreSet.withColumnRenamed("ent", "src"), Seq("src"), "left_semi")
      .join(kcCoreSet.withColumnRenamed("ent", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("ent")).agg(count(lit(1)).as("ideg"))
    val kcInducedMismatches = kcore.join(induced, Seq("ent"), "full")
      .filter(col("core_deg").isNull || col("ideg").isNull ||
        col("core_deg") =!= col("ideg")).count()
    val (kcMismatches, tKcCheck) = time {
      val c2 = GraphOps.kCore(kcSym.repartition(7), kcK)
      val bad = kcore.join(c2.withColumnRenamed("core_deg", "d2"), Seq("ent"), "full")
        .filter(col("core_deg").isNull || col("d2").isNull ||
          col("core_deg") =!= col("d2")).count()
      ConnectedComponents.releaseResult(c2)
      bad
    }
    kcore.unpersist(false)
    und.unpersist(false)

    // ---- BFS distances at scale: frontier expansion from the 3 smallest
    // node ids (hubs by construction — attachment skews to low ids, so the
    // frontier floods fast). Referees are the BFS level AXIOMS, each an
    // exact edge- or node-scale join:
    //  (1) seeds sit at distance 0;
    //  (2) no edge may join labels differing by more than 1;
    //  (3) an edge from a node labeled d < maxDepth can never reach an
    //      UNLABELED node (completeness — the frontier may only stop at
    //      the depth cap);
    //  (4) every node at d > 0 must have a neighbor at exactly d-1 (its
    //      BFS parent);
    //  (5) BFS levels are unique, so a hostile repartitioning must
    //      reproduce every (ent, dist) bit-for-bit.
    val bfsDepth = 8
    val bfsSeeds = e.select(col("src").as("ent")).distinct()
      .orderBy("ent").limit(3)
    val (bfs, tBfs) = time {
      val b = GraphOps.bfsDistances(e, bfsSeeds, bfsDepth).persist()
      b.count(); b
    }
    val bfsReached = bfs.count()
    val bfsMaxDist = bfs.agg(max("dist")).head.getLong(0)
    val bfsSeedViol = bfs.join(bfsSeeds, "ent").filter(col("dist") =!= 0L).count()
    val dSrc = bfs.select(col("ent").as("src"), col("dist").as("d_src"))
    val dDst = bfs.select(col("ent").as("dst"), col("dist").as("d_dst"))
    val lbl = e.join(dSrc, "src").join(dDst, Seq("dst"), "left").persist()
    val bfsLevelViol = lbl.filter(col("d_dst").isNotNull &&
      abs(col("d_src") - col("d_dst")) > 1).count()
    val bfsCompleteViol = lbl.filter(col("d_dst").isNull &&
      col("d_src") < bfsDepth).count()
    val bfsWitnessViol = lbl.filter(col("d_dst").isNotNull)
      .groupBy(col("dst").as("ent"), col("d_dst").as("d"))
      .agg(min(col("d_src")).as("min_nbr"))
      .filter(col("d") > 0 && col("min_nbr") =!= col("d") - 1).count()
    lbl.unpersist(false)
    val (bfsMismatches, tBfsCheck) = time {
      val b2 = GraphOps.bfsDistances(e.repartition(7), bfsSeeds, bfsDepth)
      val bad = bfs.join(b2.withColumnRenamed("dist", "d2"), Seq("ent"), "full")
        .filter(col("dist").isNull || col("d2").isNull ||
          col("dist") =!= col("d2")).count()
      ConnectedComponents.releaseResult(b2)
      bad
    }
    ConnectedComponents.releaseResult(bfs)
    bfs.unpersist(false)

    println(f"""{"nodes":$nNodesActual,"edges":$nE,"iters":$iters,"build_sec":$tBuild%.2f,"rank_sec":$tRank%.2f,"sec_per_iter":$perIter%.2f,"edge_joins_per_sec":$edgeJoinsPerSec%.0f,"mass_fp":$mass,"bitexact_mismatches":$mismatches,"check_sec":$tCheck%.2f,"wrank_sec":$tWRank%.2f,"wrank_bitexact_mismatches":$wMismatches,"wrank_check_sec":$tWCheck%.2f,"wrank_uniform_mismatches":$wUniformMismatches,"directed_edges":$nDirE,"directed_nodes":$dirNodes,"directed_sec":$tDir%.2f,"directed_mass_fp":$dirMass,"und_edges":$nUnd,"tri_sec":$tTri%.2f,"tri_total":$triTotal,"wedges_predicted":$wedgesPredicted,"tri_referee_nodes":$nRef,"tri_referee_cap":$refCap,"tri_referee_mismatches":$refMismatches,"sim_tau":$simTau,"sim_max_degree":$simCap,"sim_sec":$tSim%.2f,"sim_pairs":$nSim,"sim_referee_mismatches":$simMismatches,"cc_sec":$tCc%.2f,"cc_rounds":$ccRounds,"cc_components":$nComponents,"cc_edge_violations":$ccEdgeViolations,"cc_nonroot_labels":$ccNonRootLabels,"cc_bitexact_mismatches":$ccMismatches,"cc_check_sec":$tCcCheck%.2f,"kcore_k":$kcK,"kcore_sec":$tKc%.2f,"kcore_rounds":$kcRounds,"kcore_nodes":$kcNodes,"kcore_below_k":$kcBelowK,"kcore_induced_mismatches":$kcInducedMismatches,"kcore_bitexact_mismatches":$kcMismatches,"kcore_check_sec":$tKcCheck%.2f,"bfs_depth":$bfsDepth,"bfs_sec":$tBfs%.2f,"bfs_reached":$bfsReached,"bfs_max_dist":$bfsMaxDist,"bfs_seed_violations":$bfsSeedViol,"bfs_level_violations":$bfsLevelViol,"bfs_complete_violations":$bfsCompleteViol,"bfs_witness_violations":$bfsWitnessViol,"bfs_bitexact_mismatches":$bfsMismatches,"bfs_check_sec":$tBfsCheck%.2f}""")
    spark.stop()
  }
}
