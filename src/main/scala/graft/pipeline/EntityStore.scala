package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftConfig, Scoring, TextSim}
import graft.model.EntityRecord

/** Entity dictionary store + per-entity derived columns.
  *
  * Replaces the reference's Neo4j node store + FAISS side-index
  * (/root/reference/services/neo4j_database.py, services/vectorization.py
  * :475-534): the "index" is just an embedding column on the entity table —
  * an embarrassingly parallel map + columnar write, no separate rebuild
  * lifecycle (SURVEY.md §3.3).
  */
object EntityStore {

  /** x1 = scoring text (attributes excluded, disambiguation.py:427-437);
    * emb = deterministic embedding of the X2 text (attributes included,
    * vectorization.py:345-366). Computed once, reused by every pair. */
  def prepare(spark: SparkSession, dict: Seq[EntityRecord], cfg: GraftConfig): DataFrame = {
    import spark.implicits._
    prepare(spark.createDataset(dict), cfg)
  }

  def prepare(ds: Dataset[EntityRecord], cfg: GraftConfig): DataFrame = {
    val dim = cfg.embeddingDim
    val x1 = udf((name: String, aliases: Seq[String], defn: String) =>
      Scoring.scoringText(name, aliases, Option(defn)))
    val emb = udf((name: String, aliases: Seq[String], defn: String, attrs: Map[String, Seq[String]]) =>
      TextSim.embed(
        Scoring.embeddingText(name, aliases, Option(defn),
          if (attrs == null) Map.empty[String, Seq[String]] else attrs), dim))
    ds.toDF()
      .withColumn("x1", x1(col("name"), col("aliases"), col("definition")))
      .withColumn("emb", emb(col("name"), col("aliases"), col("definition"), col("attributes")))
  }

  def write(df: DataFrame, path: String): Unit =
    // partitioned by type-derived key: at scale this gives partition pruning
    // for the reference's type pre-filter (disambiguation.py:175-179 / F1)
    df.withColumn("type_part", coalesce(col("entity_type"), lit("__untyped__")))
      .write.mode("overwrite").partitionBy("type_part").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("type_part")
}
