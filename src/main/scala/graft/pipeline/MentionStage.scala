package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.MentionDetector
import graft.model.{EntityRecord, Mention, Turn}

/** Batched mention detection: broadcast dictionary surface index, one
  * flatMap over turns — embarrassingly parallel, no shuffle. The detector
  * semantics (longest whole-token match per position) live in
  * graft.core.MentionDetector, shared with the oracle. */
object MentionStage {

  def detect(spark: SparkSession, turns: Dataset[Turn], dict: Seq[EntityRecord]): Dataset[Mention] = {
    import spark.implicits._
    val idx = MentionDetector.buildIndex(dict)
    val bc = spark.sparkContext.broadcast(idx)
    turns.flatMap(t => MentionDetector.detect(t, bc.value))
  }
}
