package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.model.Turn

/** Streaming semantics == batch semantics: the foreachBatch decisions
  * stream over micro-batched fixtures must produce exactly the batch
  * pipeline's decisions, and the stateful first-mention operator must
  * dedupe per conversation across micro-batches. */
class StreamingKgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val cfg = GraftConfig.default
  val spec = Synth.Spec(nConv = 12, turnsPerConv = 6)
  lazy val dict = Synth.dictionary(spec)
  lazy val turns = Synth.transcripts(spec, dict)

  test("streamed decisions equal batch decisions (micro-batch split is invisible)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-dec").toString + "/out"
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    val source = MemoryStream[Turn]
    val writer = StreamingKg.decisionsStream(spark, source.toDS(), dict, cfg, out, ckpt)
      .trigger(Trigger.AvailableNow())
    // two micro-batches
    val (b1, b2) = turns.splitAt(turns.size / 2)
    source.addData(b1)
    source.addData(b2)
    writer.start().awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("mention_id", "decision", "resolved_id").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet

    val batchOut = graft.pipeline.KgPipeline.run(spark,
      graft.pipeline.TranscriptSource.fromSeq(spark, turns), dict, cfg)
    val batch = batchOut.decisions
      .select("mention_id", "decision", "resolved_id").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet

    assert(streamed == batch)
  }

  test("replayed micro-batches do not duplicate decisions (idempotent per-batch sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-replay").toString + "/out"
    def runOnce(): Long = {
      // fresh checkpoint each time => the SAME data replays as the same
      // batch ids; the batch_id=<id> overwrite sink must absorb the replay
      val ckpt = Files.createTempDirectory("stream-replay-ckpt").toString
      val source = MemoryStream[Turn]
      val writer = StreamingKg.decisionsStream(spark, source.toDS(), dict, cfg, out, ckpt)
        .trigger(Trigger.AvailableNow())
      val (b1, b2) = turns.splitAt(turns.size / 2)
      source.addData(b1)
      source.addData(b2)
      writer.start().awaitTermination()
      spark.read.parquet(out).count()
    }
    val first = runOnce()
    val replayed = runOnce()
    assert(first > 0 && replayed == first,
      s"replay duplicated rows: first=$first replayed=$replayed")
  }

  test("windowed turn-rate aggregates by event-time window and role") {
    import spark.implicits._
    val ds = spark.createDataset(turns)
    val rates = StreamingKg.turnRate(ds).collect()
    assert(rates.nonEmpty)
    assert(rates.map(_.getAs[Long]("n_turns")).sum == turns.size)
  }

  test("bounded state: expired conversation is dropped; re-mention after expiry re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def turnAt(conv: String, idx: Int, text: String, ts: String) =
      Turn(conv, idx, "user", text, "", Timestamp.valueOf(ts))
    val hot = dict.head // its name is a detectable surface
    val surf = hot.name
    val source = MemoryStream[Turn]
    // one query RUN per batch against a shared checkpoint: AvailableNow
    // would otherwise fold every addData into a single micro-batch and the
    // watermark (persisted in the offset log across runs) could never
    // advance between the steps
    val out = Files.createTempDirectory("fm-timeout-out").toString + "/out"
    val ckpt = Files.createTempDirectory("fm-timeout-ckpt").toString
    def step(data: Seq[Turn]): Unit = {
      source.addData(data)
      StreamingKg.firstMentions(spark, source.toDS(), dict,
          stateTimeout = Some("30 minutes"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // b1: two mentions of the same surface -> one emission; timeout armed
    // at 10:01 + 30min
    step(Seq(
      turnAt("cA", 0, s"first $surf here", "2024-06-01 10:00:00"),
      turnAt("cA", 1, s"again $surf now", "2024-06-01 10:01:00")))
    // b2: unrelated conv advances the watermark past 10:31
    step(Seq(turnAt("cB", 0, "nothing to detect", "2024-06-01 12:00:00")))
    // b3: cA has NO data while the watermark is past its timeout -> state
    // dropped via hasTimedOut; cC just carries the batch
    step(Seq(turnAt("cC", 0, "still nothing", "2024-06-01 12:05:00")))
    // b4: cA mentions the surface again AFTER expiry -> re-emits
    step(Seq(turnAt("cA", 9, s"back to $surf", "2024-06-01 12:10:00")))

    val got = spark.read.parquet(out).as[StreamingKg.FirstMention]
      .collect().filter(_.conv_id == "cA").sortBy(_.turn_idx)
    assert(got.map(_.turn_idx).toSeq == Seq(0, 9),
      s"expected first mention + post-expiry re-emit, got ${got.toSeq}")
  }

  test("stateful first-mention operator dedupes surfaces per conversation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Turn]
    val q = StreamingKg.firstMentions(spark, source.toDS(), dict)
      .writeStream.format("memory").queryName("fm")
      .outputMode("append").trigger(Trigger.AvailableNow())
    val (b1, b2) = turns.splitAt(turns.size / 2)
    source.addData(b1)
    source.addData(b2)
    q.start().awaitTermination()

    val got = spark.sql("select * from fm").as[StreamingKg.FirstMention].collect()
    // each (conv, surface-lower) appears exactly once
    val keys = got.map(f => (f.conv_id, f.surface.toLowerCase))
    assert(keys.length == keys.distinct.length)
    // and matches the per-conversation first occurrences computed directly
    val idx = graft.core.MentionDetector.buildIndex(dict)
    val want = turns.sortBy(t => (t.conv_id, t.turn_idx))
      .flatMap(t => graft.core.MentionDetector.detect(t, idx).map(m => (t.conv_id, m.surface.toLowerCase)))
      .distinct.toSet
    assert(keys.toSet == want)
  }
}
