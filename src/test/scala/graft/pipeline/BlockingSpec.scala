package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftConfig
import graft.fixtures.Synth

/** Salting is a pure physical-plan rewrite: the salted candidate join must
  * produce exactly the same (mention, entity) pair set as the unsalted one,
  * for any hot-key choice — here every key is declared hot, the adversarial
  * maximum. Also pins the three blocking channels' recall guarantees. */
class BlockingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cfg = GraftConfig.default
  val spec = Synth.Spec(nConv = 20, turnsPerConv = 6)
  lazy val dict = Synth.dictionary(spec)
  lazy val turns = Synth.transcripts(spec, dict)

  def pairSet(hotKeys: Set[String]): Set[(String, String)] = {
    import spark.implicits._
    val entities = EntityStore.prepare(spark, dict, cfg).cache()
    val mentions = MentionStage.detect(spark,
      TranscriptSource.fromSeq(spark, turns), dict).toDF()
    val mentionsPrep = Scorer.prepareMentions(mentions, cfg)
      .select(Scorer.mentionPrepCols.map(col): _*)
    val mB = Blocking.mentionBlocks(mentionsPrep, cfg)
    val eB = Blocking.entityBlocks(entities, cfg)
    Blocking.candidatePairs(spark, mB, eB, cfg, hotKeys)
      .as[(String, String)].collect().toSet
  }

  test("salting every key changes nothing about the candidate pair set") {
    import spark.implicits._
    val entities = EntityStore.prepare(spark, dict, cfg)
    val allKeys = Blocking.entityBlocks(entities, cfg)
      .select($"key".as[String]).collect().toSet
    assert(pairSet(allKeys) == pairSet(Set.empty))
  }

  test("exact-surface mentions always block to their entity (full-surface key recall)") {
    import spark.implicits._
    val pairs = pairSet(Set.empty)
    val entities = EntityStore.prepare(spark, dict, cfg)
    val mentions = MentionStage.detect(spark,
      TranscriptSource.fromSeq(spark, turns), dict).toDF()
    // every mention whose surface equals an entity name must pair with it
    val byName = dict.flatMap(e => (e.name +: e.aliases).map(s => s.toLowerCase -> e.id))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val ms = mentions.select($"mention_id".as[String], $"surface".as[String]).collect()
    ms.foreach { case (mid, surf) =>
      byName.get(surf.toLowerCase).foreach { owners =>
        owners.foreach(id => assert(pairs.contains((mid, id)), s"$mid/$surf missing $id"))
      }
    }
  }

  test("typed mentions block to every same-type entity (reference type branch)") {
    import spark.implicits._
    val pairs = pairSet(Set.empty)
    val mentions = MentionStage.detect(spark,
      TranscriptSource.fromSeq(spark, turns), dict).toDF()
    val typed = mentions.filter($"mention_type".isNotNull)
      .select($"mention_id".as[String], $"mention_type".as[String]).collect()
    val byType = dict.filter(_.entity_type.isDefined).groupBy(_.entity_type.get)
      .map { case (t, es) => t -> es.map(_.id).toSet }
    typed.take(50).foreach { case (mid, t) =>
      byType.getOrElse(t, Set.empty).foreach { id =>
        assert(pairs.contains((mid, id)), s"typed mention $mid missing same-type $id")
      }
    }
  }

  test("blockJoinMaxDf drops over-cap keys from the join and counts KEYS, not rows") {
    import spark.implicits._
    val cap = cfg.copy(blockJoinMaxDf = 5L)
    // fabricated index frames: key "hot" is shared by 8 entities (> cap 5),
    // key "rare" by 2; the mention blocks carry both keys
    val eB = (1 to 8).map(i => ("hot", s"e$i", "lex")) ++
      Seq(("rare", "e1", "lex"), ("rare", "e2", "lex"))
    val mB = Seq(("hot", "m1", "lex"), ("rare", "m1", "lex"), ("rare", "m2", "lex"))
    val entityB = eB.toDF("key", "id", "channel")
    val mentionB = mB.toDF("key", "mention_id", "channel")
    val acc = spark.sparkContext.longAccumulator("test.skipped_join_keys")
    val pairs = Blocking.candidatePairs(spark, mentionB, entityB, cap, Set.empty, Some(acc))
      .as[(String, String)].collect().toSet
    assert(pairs == Set(("m1", "e1"), ("m1", "e2"), ("m2", "e1"), ("m2", "e2")),
      s"over-cap key leaked into the join: $pairs")
    // ONE dropped key (not its 8 rows): the keep/skip UDF runs on the
    // key-level aggregate
    assert(acc.value == 1L, s"skipped-key accumulator counted ${acc.value}")
  }
}
