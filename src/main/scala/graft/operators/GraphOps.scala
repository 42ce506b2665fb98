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
}
