package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lenient-ingest semantics pinned against the reference's row decode
  * (neo4j_database.py:490-534): JSON-string aliases/attributes, bare
  * strings, empties, and garbage all land in the typed columns. */
class EntityIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ingest(rows: Seq[(String, String, String, String, String, String, String, String)]) = {
    import spark.implicits._
    EntityIngest.fromRaw(
      rows.toDF("id", "name", "type", "aliases", "definition", "attributes", "source", "create_time"))
      .collect().map(e => e.id -> e).toMap
  }

  test("aliases: JSON array, empty markers, bare string, garbage") {
    val m = ingest(Seq(
      ("e1", "A", "t", """["x","y"]""", null, null, null, null),
      ("e2", "B", "t", "[]", null, null, null, null),
      ("e3", "C", "t", null, null, null, null, null),
      ("e4", "D", "t", "plain alias", null, null, null, null)))
    assert(m("e1").aliases == Seq("x", "y"))
    assert(m("e2").aliases.isEmpty)
    assert(m("e3").aliases.isEmpty)
    assert(m("e4").aliases == Seq("plain alias")) // reference: unparseable => [s]
  }

  test("attributes: list-valued JSON, scalar-valued JSON promoted, garbage dropped") {
    val m = ingest(Seq(
      ("e1", "A", "t", null, null, """{"k":["v1","v2"]}""", null, null),
      ("e2", "B", "t", null, null, """{"k":"v"}""", null, null),
      ("e3", "C", "t", null, null, "not json", null, null)))
    assert(m("e1").attributes == Map("k" -> Seq("v1", "v2")))
    assert(m("e2").attributes == Map("k" -> Seq("v")))
    assert(m("e3").attributes.isEmpty)
  }

  test("attributes: MIXED array/scalar values keep every entry (reference keeps parsed dicts as-is)") {
    val m = ingest(Seq(
      ("e1", "A", "t", null, null, """{"a":["x","y"],"b":"z","n":3,"f":true}""", null, null),
      ("e2", "B", "t", null, null, """{"nested":{"k":"v"}}""", null, null)))
    assert(m("e1").attributes == Map(
      "a" -> Seq("x", "y"), "b" -> Seq("z"), "n" -> Seq("3"), "f" -> Seq("true")))
    // non-scalar non-array values survive as compact JSON text
    assert(m("e2").attributes == Map("nested" -> Seq("""{"k":"v"}""")))
  }

  test("nameless rows are dropped; timestamps parse ISO-8601") {
    val m = ingest(Seq(
      ("e1", null, "t", null, null, null, null, null),
      ("e2", "B", "t", null, "def", null, "src", "2024-01-01T10:00:00")))
    assert(!m.contains("e1"))
    assert(m("e2").create_time.map(_.toString).contains("2024-01-01 10:00:00.0"))
    assert(m("e2").definition.contains("def"))
  }
}
