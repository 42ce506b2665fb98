package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** (subj, pred, obj, props) triple materialization — the engine's graph
  * surface (Neo4j node properties + RELATIONSHIP edges in the reference,
  * /root/reference/services/neo4j_database.py:144-155, 411-417, jointly
  * carry exactly this information; SURVEY.md §7.1 triple vocabulary).
  *
  * `props: map<string,string>` carries edge properties, mirroring the
  * reference's `r += $props` on relationships (neo4j_database.py:411-417)
  * and their surfacing in get_related_entities (:437-471): property triples
  * carry an empty map; `mentions` edges carry n = the mention multiplicity
  * within the turn (the information the old distinct() discarded).
  *
  * Spark cannot run set operations over map columns, so each family
  * dedups its bare (subj, pred, obj) BEFORE attaching props; families are
  * disjoint by pred, making the union duplicate-free by construction.
  *
  * Written partitioned by pred (+ low-cardinality pred vocabulary =>
  * partition pruning for per-predicate queries at 100TB scale).
  */
object TripleEmitter {

  private val emptyProps: org.apache.spark.sql.Column =
    map().cast("map<string,string>")

  /** Entity property triples: (id, type|alias|attr:<k>|source, value). */
  def entityTriples(entities: DataFrame): DataFrame = {
    val typeT = entities.filter(col("entity_type").isNotNull)
      .select(col("id").as("subj"), lit("type").as("pred"), col("entity_type").as("obj"))
    val aliasT = entities
      .select(col("id").as("subj"), lit("alias").as("pred"), explode(col("aliases")).as("obj"))
    val attrT = entities
      .select(col("id").as("subj"), explode(col("attributes")).as(Seq("k", "vs")))
      .select(col("subj"), concat(lit("attr:"), col("k")).as("pred"), explode(col("vs")).as("obj"))
    val sourceT = entities.filter(col("source").isNotNull)
      .select(col("id").as("subj"), lit("source").as("pred"), col("source").as("obj"))
    // dedup the bare triples (duplicate aliases / attr values), then props
    typeT.union(aliasT).union(attrT).union(sourceT)
      .distinct().withColumn("props", emptyProps)
  }

  /** same_as triples from the CC labels: every non-canonical member points
    * at its component's canonical id. */
  def sameAsTriples(components: DataFrame): DataFrame =
    components.filter(col("id") =!= col("component"))
      .select(col("id").as("subj"), lit("same_as").as("pred"), col("component").as("obj"))
      .withColumn("props", emptyProps)

  /** (conv_id#turn_idx, mentions, canonical entity) from decisions.
    * resolved ids are rewritten through the canonical mapping; ambiguous
    * mentions (resolved_id null) emit nothing. The same entity mentioned
    * k times in a turn is ONE triple carrying props["n"] = k. */
  def mentionTriples(decisions: DataFrame, components: DataFrame): DataFrame =
    decisions.filter(col("resolved_id").isNotNull)
      .join(components.withColumnRenamed("id", "resolved_id"), Seq("resolved_id"), "left_outer")
      .select(
        concat(col("conv_id"), lit("#"), col("turn_idx")).as("subj"),
        lit("mentions").as("pred"),
        coalesce(col("component"), col("resolved_id")).as("obj"))
      .groupBy("subj", "pred", "obj").agg(count(lit(1)).as("n"))
      .select(col("subj"), col("pred"), col("obj"),
        map(lit("n"), col("n").cast("string")).as("props"))

  def all(entities: DataFrame, decisions: DataFrame, components: DataFrame): DataFrame =
    entityTriples(entities)
      .union(sameAsTriples(components))
      .union(mentionTriples(decisions, components))

  def write(triples: DataFrame, path: String): Unit =
    triples.write.mode("overwrite").partitionBy("pred").parquet(path)

  case class CompactionStats(filesBefore: Long, bytesBefore: Long,
                             filesAfter: Long, bytesAfter: Long)

  /** Compact a pred-partitioned triples sink: bin-pack each pred partition
    * into ~ceil(bytes/targetBytes) files, rows sorted by (subj, obj) within
    * each file. The maintenance job every long-lived 100 TB graph table
    * needs — streaming/incremental appends leave a sea of per-micro-batch
    * small files whose open/footer cost eventually dominates scans, and
    * the subj sort both improves scan locality for subject lookups and
    * feeds parquet's dictionary/RLE encoders runs instead of shuffles.
    *
    * One distributed pass: per-pred target file counts come from FS
    * metadata (driver-side directory listing — the same metadata any
    * compactor reads), rows get a subj-hash bucket in [0, files(pred)),
    * and ONE repartitionByRange on (pred, bucket) lays the data out so
    * each task holds one bucket of one pred — file counts come out exact,
    * no per-pred driver loop, no second shuffle. Writes to `outPath`
    * (compact-then-swap is the caller's move; an in-place rewrite that
    * fails mid-write would lose the store).
    *
    * Content is PRESERVED row-for-row — the driver gate reads the
    * compacted store against the same golden-oracle twin as the live
    * sink. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partStats(root: org.apache.hadoop.fs.Path): Map[String, (Long, Long)] =
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        d.getPath.getName -> ((files.length.toLong, files.map(_.getLen).sum))
      }.toMap
    val before = partStats(hadoopPath)
    // partition dir names are URL-encoded (pred=attr%3Acategory); the
    // DataFrame's pred column carries the DECODED value, so the bucket-count
    // map must be keyed by decoded names
    val filesFor: Map[String, Int] = before.map { case (dir, (_, bytes)) =>
      val pred = java.net.URLDecoder.decode(dir.stripPrefix("pred="), "UTF-8")
      pred -> math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    }
    val totalFiles = filesFor.values.map(_.toLong).sum.toInt
    val filesMap = typedLit(filesFor)
    spark.read.parquet(path)
      .withColumn("_b", pmod(hash(col("subj")), element_at(filesMap, col("pred"))))
      .repartitionByRange(totalFiles, col("pred"), col("_b"))
      .sortWithinPartitions("pred", "subj", "obj")
      .drop("_b")
      .write.mode("overwrite").partitionBy("pred").parquet(outPath)
    val after = partStats(new org.apache.hadoop.fs.Path(outPath))
    CompactionStats(
      before.values.map(_._1).sum, before.values.map(_._2).sum,
      after.values.map(_._1).sum, after.values.map(_._2).sum)
  }
}
