package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.EntityRecord

/** Lenient entity ingest — the fixture-ingest edge where the reference's
  * permissive row decode lives (SURVEY.md S12/X15; reference
  * /root/reference/services/neo4j_database.py:490-534). Inside the engine
  * attributes/aliases stay TYPED (array / map columns); this adapter turns
  * sloppy external rows (aliases/attributes as JSON strings, bare strings,
  * or missing) into that typed shape:
  *
  *  - aliases: JSON array string -> parsed; "[]"/null/empty -> []; any
  *    other unparseable string -> single-element list (reference behavior).
  *  - attributes: JSON object string -> map<string,array<string>>, with
  *    scalar values promoted to single-element lists; unparseable -> {}.
  */
object EntityIngest {

  private val aliasesCol: org.apache.spark.sql.Column = {
    val parsed = from_json(col("aliases"), org.apache.spark.sql.types.DataType.fromDDL("array<string>"))
    when(col("aliases").isNull || trim(col("aliases")) === "" || trim(col("aliases")) === "[]",
        array().cast("array<string>"))
      .when(parsed.isNotNull, parsed)
      .otherwise(array(col("aliases")))
  }

  private val attributesCol: org.apache.spark.sql.Column = {
    // two-pass parse: values may be arrays or scalars; scalars promote to
    // single-element lists (the reference passes dicts through untouched —
    // fixture values are string lists, SURVEY.md §1.1)
    val asArrays = from_json(col("attributes"), org.apache.spark.sql.types.DataType.fromDDL("map<string,array<string>>"))
    val asScalars = from_json(col("attributes"), org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
    val promoted = transform_values(asScalars, (_, v) => array(v))
    when(col("attributes").isNull, map().cast("map<string,array<string>>"))
      .when(asArrays.isNotNull, asArrays)
      .when(asScalars.isNotNull, promoted)
      .otherwise(map().cast("map<string,array<string>>"))
  }

  /** df columns (all string-typed, as an external dump would have them):
    * id, name, type, aliases, definition, attributes, source, create_time.
    * Returns a typed Dataset[EntityRecord]; rows without a name are dropped
    * (the reference returns None on conversion failure, :532-534). */
  def fromRaw(df: DataFrame): Dataset[EntityRecord] = {
    import df.sparkSession.implicits._
    df.filter(col("name").isNotNull)
      .select(
        col("id"),
        col("name"),
        col("type").as("entity_type"),
        aliasesCol.as("aliases"),
        col("definition"),
        attributesCol.as("attributes"),
        col("source"),
        to_timestamp(col("create_time")).as("create_time"))
      .as[EntityRecord]
  }
}
