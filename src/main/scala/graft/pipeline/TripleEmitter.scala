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
    * each task holds approximately one bucket of one pred — no per-pred
    * driver loop, no second shuffle. File counts come out APPROXIMATELY
    * on-target: range boundaries are sample-based, so a heavily skewed
    * store can merge two adjacent (pred, bucket) keys into one task
    * (fewer, larger files — never data loss; CompactionStats records the
    * actual counts). Writes to `outPath` (compact-then-swap is the
    * caller's move; an in-place rewrite that fails mid-write would lose
    * the store).
    *
    * Content is PRESERVED row-for-row — the driver gate reads the
    * compacted store against the same golden-oracle twin as the live
    * sink. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = partStats(fs, hadoopPath)
    val filesFor: Map[String, Int] = before.map { case (dir, (_, bytes)) =>
      val pred = unescapePathName(dir.stripPrefix("pred="))
      pred -> math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    }
    rewritePacked(spark, spark.read.parquet(path), filesFor, outPath)
    val after = partStats(fs, new org.apache.hadoop.fs.Path(outPath))
    CompactionStats(
      before.values.map(_._1).sum, before.values.map(_._2).sum,
      after.values.map(_._1).sum, after.values.map(_._2).sum)
  }

  /** Per-pred (files, bytes) from one FS directory listing — the metadata
    * any compactor reads. Keys are the RAW partition dir names
    * (`pred=<escaped>`). */
  private def partStats(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path): Map[String, (Long, Long)] =
    fs.listStatus(root).filter(_.isDirectory).map { d =>
      val files = fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      d.getPath.getName -> ((files.length.toLong, files.map(_.getLen).sum))
    }.toMap

  /** Per-pred parquet file counts, keyed by DECODED pred value — callers
    * use this to pick an incremental-compaction threshold. */
  def partitionFileCounts(spark: org.apache.spark.sql.SparkSession,
                          path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    partStats(fs, root).map { case (dir, (files, _)) =>
      unescapePathName(dir.stripPrefix("pred=")) -> files
    }
  }

  /** Decode %XX sequences ONLY (the semantics of Spark's
    * ExternalCatalogUtils.unescapePathName): partition dir names are
    * Hive-path-escaped (pred=attr%3Acategory) while the DataFrame's pred
    * column carries the DECODED value. A full URLDecoder also maps '+' to
    * space, and Hive escaping never encodes '+', so a pred containing a
    * literal '+' would get a wrong map key, element_at would return null,
    * and those rows would silently pack into a null bucket. */
  private[pipeline] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) + lo).toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The shared bin-pack rewrite: subj-hash bucket in [0, files(pred)),
    * ONE repartitionByRange on (pred, bucket), subj-sorted files. */
  private def rewritePacked(spark: org.apache.spark.sql.SparkSession,
                            rows: DataFrame, filesFor: Map[String, Int],
                            outPath: String): Unit = {
    val totalFiles = filesFor.values.map(_.toLong).sum.toInt
    val filesMap = typedLit(filesFor)
    rows
      .withColumn("_b", pmod(hash(col("subj")), element_at(filesMap, col("pred"))))
      .repartitionByRange(totalFiles, col("pred"), col("_b"))
      .sortWithinPartitions("pred", "subj", "obj")
      .drop("_b")
      .write.mode("overwrite").partitionBy("pred").parquet(outPath)
  }

  case class IncCompactionStats(predsCompacted: Seq[String],
                                predsUntouched: Seq[String],
                                filesBefore: Long, filesAfter: Long,
                                untouchedPreserved: Boolean)

  /** INCREMENTAL compaction — the form the 100 TB maintenance job actually
    * runs: a live store accretes small files unevenly (hot preds from every
    * micro-batch, cold preds rarely), and rewriting the whole store per
    * maintenance cycle (compact) re-pays the full store's IO for mostly
    * already-compact partitions. This variant compacts ONLY partitions
    * whose file count exceeds `maxFilesPerPred`, in place, via
    * compact-then-swap:
    *
    *   1. FS listing picks the hot preds (files > threshold);
    *   2. one partition-PRUNED scan (filter on the partition column — cold
    *      dirs are never opened) bin-packs the hot rows into a staging dir
    *      (same bucket/range/sort layout as `compact`);
    *   3. the SWAP: per hot pred, delete the live partition dir and rename
    *      the staged one in — the per-partition manifest move a table
    *      format (Iceberg replace-partitions) does transactionally; renames
    *      are metadata-only on any real FS.
    *
    * A crash between 3's delete and rename leaves the affected pred's rows
    * ONLY in the staging dir — so on entry this operator RECOVERS before it
    * plans: any staged `pred=` partition whose live dir is missing is the
    * residue of an interrupted swap and is renamed back into the live store
    * (completing the swap — the staged copy is the compacted rows, content-
    * equal to what the deleted live dir held); a staged partition whose
    * live dir still exists is redundant (the live rows were never deleted)
    * and is discarded with the rest of staging. Only after that sweep —
    * i.e. only once the live store is verifiably complete again — is the
    * staging dir wiped for this run's own use. Without the sweep, the
    * natural crash response (re-run the compaction) would hit the
    * unconditional staging delete and destroy the sole copy of the
    * interrupted pred's rows. Untouched partitions are never listed for
    * read, never rewritten, never renamed; `untouchedPreserved` verifies
    * their exact file identity (name, length, mtime) survived, and the
    * driver gate reads the mixed store against the same golden twin as the
    * live sink. */
  def compactIncremental(spark: org.apache.spark.sql.SparkSession,
                         path: String, maxFilesPerPred: Long,
                         targetBytes: Long = 128L * 1024 * 1024): IncCompactionStats = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverStaging(fs, root, new org.apache.hadoop.fs.Path(path + "_compact_staging"))
    val before = partStats(fs, root)
    val hotDirs = before.filter(_._2._1 > maxFilesPerPred).keySet
    val coldDirs = before.keySet -- hotDirs
    def fileIdent(dir: String): Set[(String, Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, dir)).filter(_.isFile)
        .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
    val coldBefore = coldDirs.map(d => d -> fileIdent(d)).toMap
    def decoded(dirs: Iterable[String]): Seq[String] =
      dirs.map(d => unescapePathName(d.stripPrefix("pred="))).toSeq.sorted
    if (hotDirs.isEmpty)
      return IncCompactionStats(Nil, decoded(coldDirs),
        before.values.map(_._1).sum, before.values.map(_._1).sum, untouchedPreserved = true)

    val filesFor: Map[String, Int] = hotDirs.map { dir =>
      val bytes = before(dir)._2
      unescapePathName(dir.stripPrefix("pred=")) ->
        math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    }.toMap
    // staging was already swept by recoverStaging above; wiping here only
    // clears this run's own leftovers (e.g. a failed rewritePacked)
    val staging = new org.apache.hadoop.fs.Path(path + "_compact_staging")
    fs.delete(staging, true)
    val hotRows = spark.read.parquet(path)
      .filter(col("pred").isin(filesFor.keys.toSeq: _*))
    rewritePacked(spark, hotRows, filesFor, staging.toString)
    hotDirs.foreach { dir =>
      val live = new org.apache.hadoop.fs.Path(root, dir)
      val staged = new org.apache.hadoop.fs.Path(staging, dir)
      if (!fs.exists(staged))
        throw new IllegalStateException(s"compactIncremental: staged partition missing: $staged")
      fs.delete(live, true)
      if (!fs.rename(staged, live))
        throw new IllegalStateException(s"compactIncremental: swap rename failed for $dir")
    }
    fs.delete(staging, true)
    val after = partStats(fs, root)
    val preserved = coldDirs.forall(d => fileIdent(d) == coldBefore(d))
    IncCompactionStats(decoded(hotDirs), decoded(coldDirs),
      before.values.map(_._1).sum, after.values.map(_._1).sum, preserved)
  }

  /** Crash recovery for compactIncremental's compact-then-swap (see its
    * scaladoc): staged partitions whose live dir is MISSING are the sole
    * copy of an interrupted swap's rows — rename them back in; staged
    * partitions whose live dir survives are redundant copies. Idempotent,
    * and a rename failure is loud (the live store would stay incomplete). */
  private[pipeline] def recoverStaging(fs: org.apache.hadoop.fs.FileSystem,
                                       root: org.apache.hadoop.fs.Path,
                                       staging: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(staging)) return
    fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("pred="))
      .foreach { s =>
        val live = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
        if (!fs.exists(live) && !fs.rename(s.getPath, live))
          throw new IllegalStateException(
            s"compactIncremental recovery: rename ${s.getPath} -> $live failed; " +
              "the staged partition is the only copy of those rows — aborting " +
              "rather than deleting staging")
      }
    fs.delete(staging, true)
  }
}
