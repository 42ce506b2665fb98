package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only probe (guide §1): stage-by-stage wall times of the
  * incremental-dedup path exactly as SparkEntry.incrementalPairs runs it —
  * shingle sets, corpus signature index write, batch signatures, candidate
  * derivation, verify join. Prints one line per stage.
  */
object IncStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val n = f
      println(f"stage=$name%-28s rows=$n%9d wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = graft.operators.Dedup.shingleSets(docs, n = 3, maxDf = 50L).persist()
    t("shingle_sets")(sets.count())
    val isOld = graft.operators.Corpus.splitResidue(col("doc_id")) < 80
    val oldSets = sets.filter(isOld)
    val newSets = sets.filter(!isOld)
    val idxPath = "/tmp/graft_probe_lsh_index"
    t("index_write") {
      graft.operators.Dedup.bandedSignatures(oldSets, 128, 32)
        .write.mode("overwrite").parquet(idxPath)
      0L
    }
    val idx = spark.read.parquet(idxPath)
    t("new_banded")(graft.operators.Dedup.bandedSignatures(newSets, 128, 32).count())
    val acc = spark.sparkContext.longAccumulator("probe.skipped")
    val cand = graft.operators.Dedup.incrementalCandidates(
      idx, graft.operators.Dedup.bandedSignatures(newSets, 128, 32), 4096, Some(acc)).persist()
    t("candidates")(cand.count())
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val oldPruned = oldSets.join(broadcast(candDocs), "doc_id")
    val newPruned = newSets.join(broadcast(candDocs), "doc_id")
      .join(oldPruned.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val verifySets = oldPruned.unionByName(newPruned).persist()
    t("verify_sets")(verifySets.count())
    t("verify_pairs")(graft.operators.Dedup.jaccardForPairs(verifySets, cand, 0.6).count())
    // interior of jaccardForPairs, stage by stage over the same inputs
    val vCandDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    t("vp_cand_docs")(vCandDocs.count())
    val vPruned = verifySets.join(broadcast(vCandDocs), "doc_id")
    t("vp_pruned")(vPruned.count())
    val vSizes = vPruned.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    t("vp_sizes")(vSizes.count())
    val vInter = cand
      .join(vPruned.toDF("doc_a", "shingle"), "doc_a")
      .join(vPruned.toDF("doc_b", "shingle"), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    t("vp_inter")(vInter.count())
    t("vp_full_again")(graft.operators.Dedup.jaccardForPairs(verifySets, cand, 0.6).count())
    // and the full path again end-to-end, fresh (memoless), for the total
    spark.stop()
  }
}
