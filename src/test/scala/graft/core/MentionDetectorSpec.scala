package graft.core

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{EntityRecord, Turn}

/** Detection semantics of the two-level surface index: longest whole-token
  * match, and the first-in-sorted-surface-order tie-break when distinct
  * surface strings share one token sequence (the old linear scan's
  * behavior, preserved exactly). */
class MentionDetectorSpec extends AnyFunSuite {

  private def ent(id: String, name: String, t: Option[String], aliases: Seq[String] = Nil) =
    EntityRecord(id, name, t, aliases, None, Map.empty, None,
      Some(Timestamp.valueOf("2024-01-01 10:00:00")))

  private def turn(text: String) =
    Turn("c0", 0, "user", text, "", Timestamp.valueOf("2024-06-01 00:00:00"))

  test("longest whole-token match wins at each position") {
    val idx = MentionDetector.buildIndex(Seq(
      ent("e1", "alpha", Some("drug")),
      ent("e2", "alpha beta", Some("disease")),
      ent("e3", "alpha beta gamma", Some("gene"))))
    val ms = MentionDetector.detect(turn("see alpha beta gamma today"), idx)
    assert(ms.map(_.surface) == Seq("alpha beta gamma"))
    assert(ms.head.mention_type.contains("gene"))
  }

  test("token-sequence collision: first surface in sorted-lowercase order wins") {
    // "foo  bar" (double space) sorts before "foo bar"; both tokenize to
    // [foo, bar] — the index must keep the sorted-first entry, matching the
    // pre-index linear scan's first-equal-length-match behavior
    val idx = MentionDetector.buildIndex(Seq(
      ent("e1", "foo bar", Some("drug")),
      ent("e2", "foo  bar", Some("disease"))))
    val ms = MentionDetector.detect(turn("a foo bar b"), idx)
    assert(ms.size == 1)
    assert(ms.head.surface == "foo  bar")
    assert(ms.head.mention_type.contains("disease"))
  }

  test("shared surface with disagreeing owner types detects with type None") {
    val idx = MentionDetector.buildIndex(Seq(
      ent("e1", "Omega", Some("drug")),
      ent("e2", "omega", Some("disease"))))
    val ms = MentionDetector.detect(turn("omega rises"), idx)
    assert(ms.size == 1)
    assert(ms.head.mention_type.isEmpty)
  }

  test("zh: unsegmented inline mention detected; longest surface wins over stem alias") {
    val idx = MentionDetector.buildIndex(Seq(
      ent("z1", "云岭医院", Some("机构"), Seq("云岭")),
      ent("z2", "晨光药业", Some("机构"))))
    // no whitespace anywhere — the case round 3's tokenizer was blind to
    val ms = MentionDetector.detect(turn("今天我们讨论云岭医院的相关情况"), idx)
    assert(ms.map(_.surface) == Seq("云岭医院"))
    assert(ms.head.mention_type.contains("机构"))
    // stem alias matches where the full name does not continue
    val ms2 = MentionDetector.detect(turn("云岭团队提交了报告"), idx)
    assert(ms2.map(_.surface) == Seq("云岭"))
  }

  test("zh: Latin alias embedded in a Han run; CJK punctuation separates") {
    val idx = MentionDetector.buildIndex(Seq(
      ent("z1", "云岭医院", Some("机构"), Seq("ZH7")),
      ent("e1", "alder brevi", Some("drug"))))
    val ms = MentionDetector.detect(turn("请联系ZH7获取结果。然后跟进alder brevi的问题"), idx)
    assert(ms.map(_.surface) == Seq("ZH7", "alder brevi"))
    // punctuation adjacency must not block the match
    val ms2 = MentionDetector.detect(turn("关于云岭医院。"), idx)
    assert(ms2.map(_.surface) == Seq("云岭医院"))
  }

  test("zh: mixed en/zh turn detects surfaces of both scripts with stable offsets") {
    val idx = MentionDetector.buildIndex(Seq(
      ent("z1", "泉桥大学", Some("机构")),
      ent("e1", "glimer", Some("gene"))))
    val ms = MentionDetector.detect(turn("please check 泉桥大学 report for glimer"), idx)
    assert(ms.map(_.surface) == Seq("泉桥大学", "glimer"))
    // offsets index the mixed token stream: [please, check, 泉, 桥, 大, 学, report, for, glimer]
    assert(ms.map(_.offset) == Seq(2, 8))
  }

  test("mega-dictionary index finds exact surfaces (hash probes, no scan)") {
    val dict = graft.fixtures.Synth.megaDictionary(2000)
    val idx = MentionDetector.buildIndex(dict)
    val sample = dict.filter(_.source.contains("synth-mega")).take(50)
    sample.foreach { e =>
      val ms = MentionDetector.detect(turn(s"x ${e.name} y"), idx)
      assert(ms.exists(_.surface.equalsIgnoreCase(e.name)), s"missed ${e.name}")
    }
  }
}
