package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.pipeline.{KgPipeline, TranscriptSource}
import graft.streaming.StreamingKg

/** Streaming-path throughput + batch parity at corpus scale: the spec suite
  * gates streamed-vs-batch decision EQUALITY on fixtures; this measures the
  * micro-batched path's sustained rate on a real corpus and re-checks the
  * count parity at that scale.
  *
  * Shape: the transcript corpus written as `nFiles` parquet files, consumed
  * by a file-source stream with maxFilesPerTrigger=1 under
  * Trigger.AvailableNow — i.e. `nFiles` real micro-batches through the
  * SHARED decide code path (StreamingKg.decisionsStream == batch decideTier
  * per batch), idempotent per-batch_id sink. Wall measured start →
  * termination; the same corpus then runs through the batch pipeline for
  * the parity count and the throughput ratio.
  *
  * Usage: runMain graft.app.StreamingBench [cores] [nConv] [nFiles]
  */
object StreamingBench {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val nConv = args.lift(1).map(_.toInt).getOrElse(20000)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(8)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-streaming-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val spec = Synth.Spec(nConv = nConv)
    val dict = Synth.dictionary(spec)
    val cfg = GraftConfig.default
    val root = s"/tmp/graft-streambench-$nConv-$nFiles"
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(s"$root/out")); rm(new java.io.File(s"$root/cp"))
    val inputPath = s"$root/transcripts"
    if (!new java.io.File(inputPath).exists()) {
      TranscriptSource.write(
        TranscriptSource.fromSeq(spark, Synth.transcripts(spec, dict))
          .repartition(nFiles), inputPath)
    }
    val staticTurns = TranscriptSource.read(spark, inputPath)
    val nTurns = staticTurns.count()

    // ---- streaming: nFiles micro-batches through the shared decide path
    val schema = staticTurns.schema
    val streamTurns = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inputPath)
      .as[graft.model.Turn]
    val t0 = System.nanoTime()
    val q = StreamingKg
      .decisionsStream(spark, streamTurns, dict, cfg, s"$root/out", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamWall = (System.nanoTime() - t0) / 1e9
    val streamed = spark.read.parquet(s"$root/out")
    val nStreamed = streamed.count()
    val nBatches = streamed.select("batch_id").distinct().count()

    // ---- batch parity + rate on the same corpus
    val t1 = System.nanoTime()
    val out = KgPipeline.run(spark, staticTurns, dict, cfg)
    val nBatch = out.decisions.count()
    val batchWall = (System.nanoTime() - t1) / 1e9
    out.release()

    println(
      f"""{"bench":"kg_streaming","cores":$cores,"turns":$nTurns,"micro_batches":$nBatches,"stream_wall_sec":$streamWall%.2f,"stream_decisions_per_sec":${nStreamed / streamWall}%.1f,"batch_wall_sec":$batchWall%.2f,"batch_decisions_per_sec":${nBatch / batchWall}%.1f,"decisions_streamed":$nStreamed,"decisions_batch":$nBatch,"count_parity":${nStreamed == nBatch},"stream_over_batch_wall":${streamWall / batchWall}%.2f}""")
    spark.stop()
    if (nStreamed != nBatch) sys.exit(1)
  }
}
