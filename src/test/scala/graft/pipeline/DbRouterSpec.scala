package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.fixtures.Synth

class DbRouterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val root = Files.createTempDirectory("graft_dbs").toString
  val router = new DbRouter(
    Map("default" -> s"$root/default", "medical" -> s"$root/medical"), "default")

  test("routes db_key to its namespace; default when absent") {
    assert(router.tablePath(None, "entities") == s"$root/default/entities")
    assert(router.tablePath(Some("medical"), "triples") == s"$root/medical/triples")
    assert(router.databases == Seq("default", "medical"))
  }

  test("unknown db_key fails fast with the valid-key list (reference main.py:148-154)") {
    val e = intercept[IllegalArgumentException](router.resolve(Some("nope")))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("medical"))
  }

  test("per-key stores are isolated: same table name, different contents") {
    val cfg = GraftConfig.default
    val dict = Synth.dictionary(Synth.Spec(nConv = 5))
    val all = EntityStore.prepare(spark, dict, cfg)
    router.writeEntities(all, None)
    router.writeEntities(all.filter(org.apache.spark.sql.functions.col("entity_type") === "drug"),
      Some("medical"))
    val nDefault = router.readEntities(spark, None).count()
    val nMedical = router.readEntities(spark, Some("medical")).count()
    assert(nDefault == dict.size.toLong && nMedical > 0 && nMedical < nDefault)
  }
}
