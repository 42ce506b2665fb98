package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

import graft.core.GraftConfig
import graft.fixtures.Synth
import graft.oracle.Oracle

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json for the driver's DuckDB compare.
  *
  * Additionally materializes the GOLDEN ORACLE (pure-Scala reference math,
  * graft.oracle.Oracle — no Spark in the compute path) as parquet into a
  * sibling `<outDir>_oracle/` directory, so the kg_* north-star queries get
  * full rows+schema+hash gates: their oracle SQL is just a read of those
  * independently-computed rows. The sibling dir (not a subdir of outDir)
  * keeps the driver's per-query directory scan unconfused. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    val outAbs = Paths.get(outDir).toAbsolutePath.toString.stripSuffix("/")
    val oraAbs = outAbs + "_oracle"
    dumpGoldenOracle(spark, sfDir, oraAbs)
    // engine-derived model artifacts (IVF centroids) for {AUX} twins — a
    // third sibling dir so neither the driver's per-query scan of outDir
    // nor the golden dir's "pure reference math" contract is muddied
    val auxAbs = outAbs + "_aux"
    SparkEntry.dumpAux(spark, sfDir, auxAbs)

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("{OUT}", outAbs).replace("{ORA}", oraAbs).replace("{AUX}", auxAbs))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Run the no-Spark golden oracle over the same synthetic fixture the
    * kg_* queries use and write each surface as single-file parquet with the
    * engine's exact column names/types. Spark is only the parquet writer
    * here — every value is computed by the pure-Scala oracle. */
  def dumpGoldenOracle(spark: SparkSession, sfDir: String, oraDir: String): Unit = {
    import spark.implicits._
    val cfg = GraftConfig.default
    val spec = SparkEntry.specFor(sfDir)
    val dict = Synth.dictionary(spec)
    val turns = Synth.transcripts(spec, dict)
    val golden = Oracle.run(turns, dict, cfg)

    def write(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$oraDir/$name")

    write("kg_mentions", golden.mentions.toDF()
      .select("mention_id", "conv_id", "turn_idx", "surface", "offset"))
    write("kg_decisions", golden.decisions.toDF()
      .select("mention_id", "surface", "decision", "match_id", "resolved_id", "final_score"))
    write("kg_decisions_forced", golden.forcedDecisions.toDF()
      .select("mention_id", "decision", "match_id", "resolved_id", "final_score"))
    write("kg_mention_props", Oracle.mentionPropCounts(golden)
      .toDF("subj", "obj", "n_mentions"))
    write("kg_components", Oracle.components(dict, golden).toDF("id", "component"))
    write("kg_triples", golden.triples.toSeq.toDF("subj", "pred", "obj"))
    write("kg_decision_stats", Oracle.decisionStats(golden.decisions)
      .toDF("decision", "n", "n_recent", "recent_rate"))
    write("kg_candidates_topk", golden.candidatesTopK.toDF())
    write("kg_decisions_explained", golden.decisions.map(Oracle.explained(_, cfg))
      .toDF("mention_id", "decision", "similarity_details", "reasoning"))
    // fixture dictionary dump for twins that re-derive over the entity table
    // (alias substring search; 1-hop neighbor rehydration)
    write("fixtures_entities", spark.createDataset(dict).toDF()
      .select("id", "name", "entity_type", "aliases"))

    // zh-mixed golden twin (round-4 CJK gate): same no-Spark oracle over the
    // zh/en fixture — unsegmented inline mentions, the reference corpus's
    // primary language
    val zhSpec = SparkEntry.zhSpecFor(sfDir)
    val zhDict = Synth.zhDictionary(zhSpec)
    val zhGolden = Oracle.run(Synth.zhTranscripts(zhSpec, zhDict), zhDict, cfg)
    write("kg_mentions_zh", zhGolden.mentions.toDF()
      .select("mention_id", "conv_id", "turn_idx", "surface", "offset"))
    write("kg_decisions_zh", zhGolden.decisions.toDF()
      .select("mention_id", "surface", "decision", "match_id", "resolved_id", "final_score"))
    write("kg_triples_zh", zhGolden.triples.toSeq.toDF("subj", "pred", "obj"))
    // zh reasoning surface: same decisions, engine-authored zh templates
    // (cfg.reasoningLang) — gates the language flip end to end
    write("kg_decisions_explained_zh",
      zhGolden.decisions.map(Oracle.explained(_, cfg.copy(reasoningLang = "zh")))
        .toDF("mention_id", "decision", "similarity_details", "reasoning"))

    // zh/mixed documents fixture for the round-5 text-operator twins
    // (token counts / quality / vocab head / char-n-gram dedup re-derive
    // over these identical rows with DuckDB's RE2 CJK tokenizer)
    write("fixtures_zh_docs",
      Synth.zhDocuments(SparkEntry.zhDocCountFor(sfDir)).toDF("doc_id", "lang", "text"))
    // planted-PII documents for the scrub twin (identical rows, RE2
    // re-derivation of counts + redaction)
    write("fixtures_pii_docs",
      Synth.piiDocuments(SparkEntry.zhDocCountFor(sfDir)).toDF("doc_id", "text"))
  }
}
