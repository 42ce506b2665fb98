package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.model.{EntityRecord, Mention}
import graft.oracle.Oracle

/** The single-record API must agree with the golden oracle's per-mention
  * decisions: a mention viewed as a query entity (name = surface,
  * definition = turn context) gets the same decision / match / scores. */
class GraftApiSpec extends AnyFunSuite {
  val cfg = GraftConfig.default
  val spec = Synth.Spec(nConv = 20, turnsPerConv = 6)
  val dict = Synth.dictionary(spec)
  val turns = Synth.transcripts(spec, dict)
  val apiDict = new GraftApi.Dictionary(dict, cfg)

  def asQueryEntity(m: Mention): EntityRecord =
    EntityRecord(m.mention_id, m.surface, m.mention_type, Nil,
      Some(m.context), Map.empty, None, None)

  test("autoDecide matches the oracle decision for every fixture mention") {
    val golden = Oracle.run(turns, dict, cfg)
    val byId = golden.decisions.map(d => d.mention_id -> d).toMap
    var checked = 0
    golden.mentions.foreach { m =>
      val want = byId(m.mention_id)
      val got = GraftApi.autoDecide(asQueryEntity(m), apiDict, cfg)
      assert(got.decision == want.decision, s"${m.mention_id}: $got vs $want")
      assert(got.matchId == want.match_id)
      if (want.decision != "create" || want.match_id.isDefined || got.score.final_score != 0.0)
        assert(math.abs(got.score.final_score - want.final_score) < 1e-12 ||
          (want.decision == "create" && want.final_score == 1.0))
      checked += 1
    }
    assert(checked > 50)
  }

  test("matchCandidates: ranked in merge order, k-bounded, self excluded") {
    val e = dict.head
    val cands = GraftApi.matchCandidates(e, apiDict, cfg, topK = 5)
    assert(cands.size <= 5 && cands.nonEmpty)
    // rank is 1-based retrieval-merge order (reference enumerate,
    // disambiguation.py:238) — final scores need NOT be monotone
    assert(cands.map(_.rank) == (1 to cands.size))
    assert(!cands.exists(_.entity.id == e.id))
    assert(cands.head.similarityDetails.contains("final="))
  }

  test("empty dictionary: create with confidence 1.0") {
    val r = GraftApi.autoDecide(dict.head, new GraftApi.Dictionary(Nil, cfg), cfg)
    assert(r.decision == "create" && r.confidence == 1.0 && r.matchId.isEmpty)
  }

  test("read endpoints: history/stats/databases wrap the pipeline frames (main.py:218-297 parity)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val out = graft.pipeline.KgPipeline.run(spark,
      graft.pipeline.TranscriptSource.fromSeq(spark, turns), dict, cfg)

    // history: recency-ordered, limit-bounded, newest first
    val h = GraftApi.history(out.decisions, limit = 10).collect()
    assert(h.length == 10)
    val newest = out.decisions
      .orderBy(org.apache.spark.sql.functions.col("conv_id").desc,
        org.apache.spark.sql.functions.col("turn_idx").desc,
        org.apache.spark.sql.functions.col("offset").desc)
      .limit(1).collect().head.getAs[String]("mention_id")
    assert(h.head.getAs[String]("mention_id") == newest)

    // stats: identical rows to the driver-gated decisionStats frame
    val s = GraftApi.stats(out.decisions).collect().map(_.toSeq).toSet
    val gate = out.decisionStats.collect().map(_.toSeq).toSet
    assert(s == gate && s.nonEmpty)

    // index stats over a prepped entity frame (has emb)
    val ix = GraftApi.indexStats(
      graft.pipeline.EntityStore.prepare(spark, dict, cfg)).collect().head
    assert(ix.getAs[Long]("entity_count") == dict.size.toLong)
    assert(ix.getAs[Long]("dimension") == cfg.embeddingDim.toLong)

    // databases: configured keys, sorted (reference GET /databases)
    val router = new graft.pipeline.DbRouter(
      Map("default" -> "/tmp/g_default", "medical" -> "/tmp/g_med"), "default")
    assert(GraftApi.databases(router) == Seq("default", "medical"))
    out.release()
  }
}
