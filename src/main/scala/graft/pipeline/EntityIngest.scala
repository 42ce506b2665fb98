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

  private def jvToString(v: org.json4s.JValue): String = {
    import org.json4s._
    v match {
      case JString(s)  => s
      case JInt(i)     => i.toString
      case JLong(l)    => l.toString
      case JDouble(d)  => d.toString
      case JDecimal(d) => d.toString
      case JBool(b)    => b.toString
      case JNull       => null
      case other => org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(other))
    }
  }

  /** Single real-JSON parse (json4s ships on the Spark classpath) with
    * per-VALUE promotion, so MIXED objects like {"a":["x"],"b":"y"} keep
    * every entry — the reference keeps any successfully parsed dict as-is
    * (neo4j_database.py:510-520); a schema-typed from_json would null the
    * whole map on the first value that disagrees with the schema. Scalars
    * promote to single-element lists; unparseable/non-object input => {}. */
  private val attributesCol: org.apache.spark.sql.Column = {
    val parse = udf { raw: String =>
      import org.json4s._
      if (raw == null || raw.trim.isEmpty) Map.empty[String, Seq[String]]
      else try {
        org.json4s.jackson.JsonMethods.parse(raw) match {
          case JObject(fields) =>
            fields.map { case (k, v) =>
              k -> (v match {
                case JArray(items) => items.map(jvToString)
                case other         => Seq(jvToString(other))
              })
            }.toMap
          case _ => Map.empty[String, Seq[String]]
        }
      } catch {
        // NonFatal only: a parse failure means empty attributes, but fatal
        // JVM errors (OOM, interrupts) must surface as executor failure,
        // never masquerade as silently-empty data
        case scala.util.control.NonFatal(_) => Map.empty[String, Seq[String]]
      }
    }
    parse(col("attributes"))
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
