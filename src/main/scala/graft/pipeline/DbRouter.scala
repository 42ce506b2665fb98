package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-database routing — the engine analog of the reference's
  * database-factory manager (/root/reference/services/database_factory.py:
  * 100-108 validates a db_key against the configured set, :173-219 returns
  * the per-key store). In a lake engine a "database" is a catalog namespace:
  * db_key -> table-path prefix, so every store surface (entities, triples,
  * decisions) routes through one resolver instead of hardcoded paths.
  *
  * Unknown keys fail fast with the known-key list, mirroring the
  * reference's 400-with-valid-keys behavior (main.py:148-154).
  */
final class DbRouter(roots: Map[String, String], defaultKey: String) {
  require(roots.contains(defaultKey), s"default db_key '$defaultKey' not configured")

  /** Known db_keys (reference GET /databases analog). */
  def databases: Seq[String] = roots.keys.toSeq.sorted

  def resolve(dbKey: Option[String]): String = {
    val k = dbKey.getOrElse(defaultKey)
    roots.getOrElse(k,
      throw new IllegalArgumentException(
        s"unknown db_key '$k'; valid: ${databases.mkString(", ")}"))
  }

  def tablePath(dbKey: Option[String], table: String): String =
    s"${resolve(dbKey).stripSuffix("/")}/$table"

  def writeEntities(df: DataFrame, dbKey: Option[String] = None): Unit =
    EntityStore.write(df, tablePath(dbKey, "entities"))

  def readEntities(spark: SparkSession, dbKey: Option[String] = None): DataFrame =
    EntityStore.read(spark, tablePath(dbKey, "entities"))

  def writeTriples(df: DataFrame, dbKey: Option[String] = None): Unit =
    TripleEmitter.write(df, tablePath(dbKey, "triples"))

  def readTriples(spark: SparkSession, dbKey: Option[String] = None): DataFrame =
    spark.read.parquet(tablePath(dbKey, "triples"))
}
