package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.model.Triple
import graft.oracle.Oracle

/** Round-4 CJK gate: the zh/en mixed fixture (unsegmented inline mentions —
  * the reference corpus's own shape) flows through the FULL pipeline and
  * matches the no-Spark oracle exactly. Before the CJK-aware tokenizer a
  * transcript containing 云岭医院 inline could never match any dictionary
  * surface — this spec is what keeps that regression impossible. */
class ZhPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cfg = GraftConfig.default
  val spec = Synth.Spec(nConv = 30, turnsPerConv = 8)
  lazy val dict = Synth.zhDictionary(spec)
  lazy val turns = Synth.zhTranscripts(spec, dict)
  lazy val golden = Oracle.run(turns, dict, cfg)

  test("zh fixture actually exercises the unsegmented case") {
    // guard against fixture drift: zh-named entities exist, and some turn
    // embeds a zh surface with NO adjacent whitespace
    val zhNames = dict.filter(_.name.exists(Character.isIdeographic(_)))
    assert(zhNames.size > dict.size / 2)
    val inline = turns.exists { t =>
      zhNames.exists(e => {
        val i = t.text.indexOf(e.name)
        i > 0 && !t.text.charAt(i - 1).isWhitespace
      })
    }
    assert(inline, "no unsegmented inline zh mention in the fixture")
    // and the oracle detects zh surfaces (not just the Latin aliases)
    assert(golden.mentions.exists(_.surface.exists(Character.isIdeographic(_))))
  }

  test("engine triples == golden oracle on the zh-mixed corpus (P/R = 1.0)") {
    import spark.implicits._
    val out = KgPipeline.run(spark, TranscriptSource.fromSeq(spark, turns), dict, cfg)
    val engine = out.triples.select("subj", "pred", "obj").as[Triple].collect().toSet
    val (p, r) = Oracle.precisionRecall(engine, golden.triples)
    withClue(f"P=$p%.4f R=$r%.4f missing=${golden.triples.diff(engine).take(3)} extra=${engine.diff(golden.triples).take(3)}") {
      assert(p == 1.0 && r == 1.0)
    }
    out.release()
  }

  test("zh decisions cover all three branches; zh near-dup names canonicalize") {
    val byDecision = golden.decisions.groupBy(_.decision).view.mapValues(_.size).toMap
    assert(byDecision.keySet == Set("merge", "create", "ambiguous"), s"$byDecision")
    // one-character-substituted zh near-duplicates must produce same_as
    // edges (canonical = lexicographic MIN id, and "dup_zh_*" < "zh_*", so
    // the dup id is usually the canonical side)
    assert(golden.sameAs.nonEmpty)
    assert(golden.sameAs.exists { case (d, c) =>
      d.startsWith("dup_zh_") || c.startsWith("dup_zh_") })
  }

  test("forced blocked tier holds P/R >= 0.999 on the zh corpus too") {
    import spark.implicits._
    val cfgB = cfg.copy(broadcastSweepMaxDict = 0L)
    val out = KgPipeline.run(spark, TranscriptSource.fromSeq(spark, turns), dict, cfgB)
    val engine = out.triples.select("subj", "pred", "obj").as[Triple].collect().toSet
    val (p, r) = Oracle.precisionRecall(engine, golden.triples)
    withClue(f"P=$p%.4f R=$r%.4f") { assert(p >= 0.999 && r >= 0.999) }
    out.release()
  }
}
