package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-hop read queries over the triple store — the traversals one step
  * beyond the reference's 1-hop neighborhood read (neo4j_database.py's
  * single-relation expansions; here as relational plans over the (subj,
  * pred, obj) frame, which is how a Spark-native KG serves them at 100 TB:
  * Cypher hops become self-joins whose join sides are pred-partition-pruned
  * scans, broadcast when dictionary-sized).
  */
object GraphOps {

  /** Co-mention pairs: entities mentioned in the same transcript turn — a
    * 2-hop traversal through the turn hub node (entity <- turn -> entity),
    * the edge-induction step entity-linking pipelines feed into co-occurrence
    * graphs. Self-join of the `mentions` edge list on the turn id with a
    * canonical a < b orientation; the shuffle key is the TURN, so the pair
    * blow-up per turn is bounded by mentions-per-turn squared (single-digit
    * in transcripts — the hub bound), never corpus-scale. Returns
    * (entity_a, entity_b, n_turns) with n_turns the co-mention support. */
  def coMentions(triples: DataFrame): DataFrame = {
    val m = triples.filter(col("pred") === "mentions")
      .select(col("subj").as("turn"), col("obj").as("ent"))
    m.as("a").join(m.as("b"),
        col("a.turn") === col("b.turn") && col("a.ent") < col("b.ent"))
      .groupBy(col("a.ent").as("entity_a"), col("b.ent").as("entity_b"))
      .agg(count(lit(1)).as("n_turns"))
  }

  /** Turn -> entity -> type: 2-hop resolution of every mention edge through
    * the entity's `type` edge, aggregated to per-type mention volume. The
    * type side is dictionary-sized (one edge per known entity), so it
    * BROADCASTS — the mentions side never moves for the join; the only
    * exchange is the final per-type aggregate (partial map-side combine
    * makes it |types| rows). Mentions of created (non-dictionary) entities
    * have no type edge and drop out — inner-join semantics, the "resolved
    * against the ontology" read. */
  def twoHopTypes(triples: DataFrame): DataFrame = {
    val m = triples.filter(col("pred") === "mentions")
      .select(col("subj").as("turn"), col("obj").as("ent"))
    val t = triples.filter(col("pred") === "type")
      .select(col("subj").as("ent"), col("obj").as("entity_type"))
    m.join(broadcast(t), "ent")
      .groupBy("entity_type")
      .agg(
        count(lit(1)).as("n_mentions"),
        countDistinct(col("turn")).as("n_turns"))
  }

  /** Directed co-mention edge list (both orientations of every undirected
    * co-mention pair): the symmetric graph pageRankFp and other iterative
    * algorithms run on. Distinct (src, dst) — support counts live in
    * `coMentions`; the traversal layer is unweighted. */
  def comentionEdges(triples: DataFrame): DataFrame = {
    val m = triples.filter(col("pred") === "mentions")
      .select(col("subj").as("turn"), col("obj").as("ent"))
    m.as("a").join(m.as("b"),
        col("a.turn") === col("b.turn") && col("a.ent") =!= col("b.ent"))
      .select(col("a.ent").as("src"), col("b.ent").as("dst"))
      .distinct()
  }

  /** PageRank in 64-bit FIXED-POINT arithmetic — every operation is an
    * int64 multiply / integer division / sum, so the result is bit-exact
    * on ANY engine, any partitioning, any addition order (float PageRank
    * differs in the last ulps between engines because double addition is
    * not associative; an integer sum is). Ranks carry `scale` units of
    * probability mass (default 1e12 — 12 significant digits, and the
    * overflow headroom is wide: total mass is ~scale, so the worst
    * 85×sum term stays below 1e14 « 2^63). Damping 0.85 and teleport
    * 0.15/N are exact integer spellings:
    *
    *   r0(v)   = scale div N
    *   tele    = (15 * (scale div N)) div 100
    *   r_k+1(v)= tele + (85 * Σ_{u→v} (r_k(u) div deg(u))) div 100
    *
    * `edges` must be a DIRECTED edge list where every node appears as BOTH
    * src and dst (symmetric graphs — comentionEdges — satisfy this
    * trivially): src-side guarantees no dangling mass, dst-side guarantees
    * every node's rank survives the per-iteration aggregate. Truncation is
    * the only mass leak (≤ deg ulps per node per round, bounded and
    * deterministic). Fixed `iterations` (not convergence-
    * tested): deterministic cost, and the K-step rank is itself a
    * well-defined centrality. Each iteration is ONE join of the edge list
    * with the (node-sized) rank frame plus one dst-keyed aggregate — at
    * 100 TB the edge list partitioning is reused across iterations and
    * the rank frame is the only thing that changes. Lineage is severed
    * every `checkpointEvery` rounds (localCheckpoint; same discipline as
    * ConnectedComponents — an unsevered K-iteration plan re-analyzes
    * exponentially on real pipeline inputs). */
  def pageRankFp(edges: DataFrame, iterations: Int,
                 scale: Long = 1000000000000L,
                 checkpointEvery: Int = 4): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.count()
    require(n > 0, "pageRankFp: empty edge list")
    val r0 = scale / n
    val tele = (15L * r0) / 100L
    // the LOOP INVARIANT, built once: (src, dst, deg) pre-partitioned on
    // src and checkpointed. Every iteration joins it with the node-sized
    // rank frame on src — the edge side never moves again (its
    // hashpartitioning survives the checkpoint), so each round costs ONE
    // exchange: the dst-keyed contribution aggregate, which IS PageRank's
    // irreducible shuffle. Joining deg inside the loop instead re-shuffled
    // the full edge list twice per round (measured 2.2x slower at 19M
    // edges).
    val eDeg = e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    var ranks = deg.select(col("src").as("ent"), lit(r0).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("ent", "src"), "src")
        .select(col("dst").as("ent"), expr("rank div deg").as("c"))
      ranks = contribs.groupBy("ent").agg(sum(col("c")).as("s"))
        .select(col("ent"), (lit(tele) + expr("(85 * s) div 100")).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("ent"), col("rank").as("rank_fp"))
  }
}
