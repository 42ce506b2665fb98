package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftConfig, TextSim}

/** Blocking-key candidate generation — the engine's analog of the
  * reference's cheap FAISS retrieval stage before the expensive 4-way scorer
  * (/root/reference/services/vectorization.py:627-628; SURVEY.md J1, §4).
  *
  * Keys per surface: the full lowercased surface (guarantees recall for
  * exact-surface mentions) plus its char n-grams. Scale controls:
  *  - n-grams whose entity-side document frequency exceeds cfg.blockMaxDf
  *    are dropped from the index (all cost, no selectivity) — the
  *    full-surface key keeps recall;
  *  - hot keys on the mention side (e.g. one entity mentioned in 40% of
  *    turns) are SALTED: the entity side of the join is replicated
  *    cfg.saltBuckets ways for those keys, the mention side picks a salt
  *    from a hash of mention_id, spreading one hot key over R reducers.
  *    AQE skew-join remains on as backstop.
  */
object Blocking {

  def blockKeysUdf(cfg: GraftConfig) = udf { surface: String =>
    if (surface == null) Array.empty[String]
    else (surface.toLowerCase.trim +: TextSim.blockingGrams(surface, cfg.blockNgramSize)).distinct
  }

  /** (key, entity_id) blocking index over name + aliases. */
  def entityBlocks(entities: DataFrame, cfg: GraftConfig): DataFrame = {
    val keys = blockKeysUdf(cfg)
    val surfaces = entities
      .select(col("id"), explode(concat(array(col("name")), col("aliases"))).as("surface"))
    val exploded = surfaces
      .select(col("id"), explode(keys(col("surface"))).as("key"))
      .distinct()
    // df sketch: drop low-selectivity grams, but never the full-surface keys
    val fullSurface = surfaces.select(col("id"), lower(trim(col("surface"))).as("key")).distinct()
    val dfCounts = exploded.groupBy("key").agg(count(lit(1)).as("df"))
    exploded.join(dfCounts, "key")
      .filter(col("df") <= cfg.blockMaxDf)
      .select("key", "id")
      .union(fullSurface.select("key", "id"))
      .distinct()
  }

  /** (key, mention_id) for each mention surface. */
  def mentionBlocks(mentions: DataFrame, cfg: GraftConfig): DataFrame = {
    val keys = blockKeysUdf(cfg)
    mentions
      .select(col("mention_id"), explode(keys(col("surface"))).as("key"))
      .distinct()
  }

  /** Distinct (mention_id, entity_id) candidate pairs via the key equi-join,
    * with hot-key salting. `hotKeys` comes from a mention-side frequency
    * pre-pass; pass empty to disable salting. */
  def candidatePairs(
      spark: SparkSession,
      mentionB: DataFrame,
      entityB: DataFrame,
      cfg: GraftConfig,
      hotKeys: Set[String]): DataFrame = {
    if (hotKeys.isEmpty) {
      mentionB.join(entityB, "key").select("mention_id", "id").distinct()
    } else {
      val hot = spark.sparkContext.broadcast(hotKeys)
      val isHot = udf((k: String) => hot.value.contains(k))
      val r = cfg.saltBuckets
      val mSalted = mentionB.withColumn("salt",
        when(isHot(col("key")), pmod(xxhash64(col("mention_id")), lit(r))).otherwise(lit(0L)))
      val allSalts = typedLit[Seq[Long]](0L until r.toLong)
      val eSalted = entityB.withColumn("salt",
        explode(when(isHot(col("key")), allSalts).otherwise(typedLit[Seq[Long]](Seq(0L)))))
      mSalted.join(eSalted, Seq("key", "salt")).select("mention_id", "id").distinct()
    }
  }

  /** Mention-side hot-key sketch: keys occurring more than `threshold`
    * times. A cheap count pre-pass (map-side partial agg). */
  def hotKeySketch(mentionB: DataFrame, threshold: Long): Set[String] = {
    import mentionB.sparkSession.implicits._
    mentionB.groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .select($"key".as[String])
      .collect().toSet
  }
}
