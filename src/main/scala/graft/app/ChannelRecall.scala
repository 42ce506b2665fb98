package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Candidates, GraftConfig, Scoring, TextSim}
import graft.fixtures.Synth
import graft.model.Triple
import graft.oracle.Oracle
import graft.pipeline._

/** Forced blocked-tier fidelity diagnostic: runs the pipeline with the
  * broadcast sweep DISABLED (broadcastSweepMaxDict=0 — the tier that
  * actually runs at 100TB dictionary scale), measures triple P/R vs the
  * golden oracle, and attributes every lost per-mention best candidate to
  * the blocking channel(s) that could/should have retrieved it
  * (lex / type / lsh) — the per-channel recall accounting that tells us
  * WHICH channel to tune instead of guessing.
  *
  * args: [nConv] [lshTables] [lshBits]
  */
object ChannelRecall {
  def main(args: Array[String]): Unit = {
    val nConv = args.headOption.map(_.toInt).getOrElse(100)
    val lshTables = args.lift(1).map(_.toInt).getOrElse(GraftConfig.default.lshTables)
    val lshBits = args.lift(2).map(_.toInt).getOrElse(GraftConfig.default.lshBits)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = GraftConfig.default.copy(
      broadcastSweepMaxDict = 0L, lshTables = lshTables, lshBits = lshBits)
    val spec = Synth.Spec(nConv = nConv)
    val dict = Synth.dictionary(spec)
    val turns = Synth.transcripts(spec, dict)
    val golden = Oracle.run(turns, dict, GraftConfig.default)

    val out = KgPipeline.run(spark, TranscriptSource.fromSeq(spark, turns), dict, cfg)
    val engine = out.triples.select("subj", "pred", "obj").as[Triple].collect().toSet
    val (p, r) = Oracle.precisionRecall(engine, golden.triples)
    println(f"triples: engine=${engine.size} oracle=${golden.triples.size} P=$p%.4f R=$r%.4f")

    // engine decisions vs oracle decisions
    val engDec = out.decisions.select("mention_id", "decision", "resolved_id", "best_id")
      .collect().map(r0 => r0.getString(0) -> ((r0.getString(1), Option(r0.getString(2)), Option(r0.getString(3))))).toMap
    val diffs = golden.decisions.filter { d =>
      val e = engDec(d.mention_id)
      e._1 != d.decision || e._2 != d.resolved_id
    }
    println(s"decision diffs: ${diffs.size} of ${golden.decisions.size}")

    // oracle best per diff mention (brute force, fixture-scale);
    // deterministic max: highest score, then LOWEST id on ties (matches scorer)
    val prepped = Candidates.prep(dict, GraftConfig.default)
    val mentionById = golden.mentions.map(m => m.mention_id -> m).toMap
    def oracleBest(mid: String): String = {
      val m = mentionById(mid)
      val tf = TextSim.tfVector(Scoring.mentionScoringText(m))
      val emb = TextSim.embed(Scoring.mentionEmbeddingText(m), cfg.embeddingDim)
      prepped.map { e =>
        e.id -> Scoring.pairScorePrepped(m.surface, Nil, m.mention_type, tf, emb,
          e.name, e.aliases, e.etype, e.tf, e.emb, cfg).final_score
      }.sortBy { case (id, s) => (-s, id) }.head._1
    }

    // channel-tagged retrieval pairs actually produced by the blocking join
    val entities = EntityStore.prepare(spark, dict, cfg)
    val entityB = Blocking.entityBlocks(entities, cfg)
    val mentionsPrep = Scorer.prepareMentions(out.mentions, cfg)
      .select(Scorer.mentionPrepCols.map(col): _*)
    val mentionB = Blocking.mentionBlocks(mentionsPrep, cfg)
    val chanPairs = mentionB.toDF("mention_id", "key", "mchan")
      .join(entityB.toDF("key", "id", "echan"), "key")
      .select("mention_id", "id", "echan").distinct()
      .collect().map(r0 => (r0.getString(0), r0.getString(1), r0.getString(2)))
    val byPair = chanPairs.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet).toMap

    val chanCounts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    var notRetrieved = 0
    diffs.foreach { d =>
      val best = oracleBest(d.mention_id)
      byPair.get((d.mention_id, best)) match {
        case Some(chans) => chans.foreach(c => chanCounts(s"retrieved_via_$c") += 1)
        case None => notRetrieved += 1; chanCounts("NOT_RETRIEVED") += 1
      }
    }
    println(s"diff-mention oracle-best retrieval accounting: ${chanCounts.toSeq.sortBy(_._1)}")
    println(s"not retrieved by ANY channel: $notRetrieved")
    val dictById = dict.map(e => e.id -> e).toMap
    diffs.take(8).foreach { d =>
      val m = mentionById(d.mention_id)
      val best = oracleBest(d.mention_id)
      val e = dictById(best)
      val eng = engDec(d.mention_id)
      println(s"  MISS mention='${m.surface}' type=${m.mention_type} -> best=$best " +
        s"name='${e.name}' type=${e.entity_type} aliases=${e.aliases} | " +
        s"oracle=(${d.decision},${d.resolved_id}) engine=$eng")
    }
    spark.stop()
  }
}
