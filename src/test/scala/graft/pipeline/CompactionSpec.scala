package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TripleEmitter.compact semantics: content preserved row-for-row under the
  * bin-packed re-layout, small files actually merged, per-pred file counts
  * bounded by the byte-derived targets, and URL-encoded pred partition
  * names (attr:category -> attr%3Acategory) resolved correctly. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def countFiles(dir: String): Map[String, Int] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
  }

  test("compact: merges the small-file sea, preserves rows, respects per-pred targets") {
    import spark.implicits._
    // a skewed store with an URL-encoded pred: 2000 'mentions' rows, 200
    // 'attr:category' rows, 10 'type' rows — written at parallelism 16 to
    // fabricate the incremental-append small-file shape
    val triples = (
      (1 to 2000).map(i => (s"turn$i", "mentions", s"e${i % 97}")) ++
      (1 to 200).map(i => (s"e$i", "attr:category", s"c${i % 7}")) ++
      (1 to 10).map(i => (s"e$i", "type", "disease"))
    ).toDF("subj", "pred", "obj")
      .withColumn("props", map().cast("map<string,string>"))
    val src = "/tmp/graft_test_compact_src"
    val out = "/tmp/graft_test_compact_out"
    triples.repartition(16).write.mode("overwrite").partitionBy("pred").parquet(src)
    val filesBefore = countFiles(src)
    assert(filesBefore.values.sum >= 35, s"fixture not fragmented: $filesBefore")

    // targetBytes larger than any partition => exactly ONE file per pred
    val stats = TripleEmitter.compact(spark, src, out, targetBytes = 64L * 1024 * 1024)
    val filesAfter = countFiles(out)
    assert(filesAfter.values.forall(_ == 1), filesAfter)
    assert(filesAfter.keySet == filesBefore.keySet, "partition dirs must be preserved")
    assert(stats.filesBefore == filesBefore.values.sum.toLong)
    assert(stats.filesAfter == filesAfter.values.sum.toLong)

    // content identical as a multiset
    val a = spark.read.parquet(src).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count()
    val b = spark.read.parquet(out).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // a tiny target splits the big partition into multiple bounded files
    // while the 10-row pred stays at one
    val mentionsBytes = new java.io.File(s"$src/pred=mentions").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val tiny = math.max(1L, mentionsBytes / 4)
    val out2 = "/tmp/graft_test_compact_out2"
    TripleEmitter.compact(spark, src, out2, targetBytes = tiny)
    val files2 = countFiles(out2)
    assert(files2("pred=mentions") >= 2, files2)
    assert(files2("pred=type") == 1, files2)
  }

  test("compactIncremental: hot preds swapped in place, cold preds byte-untouched, content preserved") {
    import spark.implicits._
    val triples = (
      (1 to 2000).map(i => (s"turn$i", "mentions", s"e${i % 97}")) ++
      (1 to 200).map(i => (s"e$i", "attr:category", s"c${i % 7}")) ++
      (1 to 10).map(i => (s"e$i", "type", "disease"))
    ).toDF("subj", "pred", "obj")
      .withColumn("props", map().cast("map<string,string>"))
    val store = "/tmp/graft_test_inccompact_store"
    triples.repartition(16).write.mode("overwrite").partitionBy("pred").parquet(store)
    val beforeContent = spark.read.parquet(store).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count().collect().toSet
    // dir names are Hive-escaped (pred=attr%3Acategory) while stats carry
    // DECODED pred values — translate at the boundary
    def decoded(dir: String) =
      TripleEmitter.unescapePathName(dir.stripPrefix("pred="))
    def fileIdent(dir: String) =
      new java.io.File(s"$store/$dir").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    val filesBefore = countFiles(store)
    // threshold between type's count and mentions' count => mixed store
    val thr = filesBefore("pred=type").toLong
    val coldDirs = filesBefore.filter(_._2 <= thr).keySet
    assert(coldDirs.nonEmpty && coldDirs.size < filesBefore.size)
    val coldIdentBefore = coldDirs.map(d => d -> fileIdent(d)).toMap

    val stats = TripleEmitter.compactIncremental(spark, store, maxFilesPerPred = thr,
      targetBytes = 64L * 1024 * 1024)

    // mixed sets as the threshold dictates, reported faithfully
    assert(stats.predsUntouched.toSet == coldDirs.map(decoded), stats)
    assert(stats.predsCompacted.nonEmpty &&
      stats.predsCompacted.toSet ==
        (filesBefore.keySet -- coldDirs).map(decoded), stats)
    assert(stats.untouchedPreserved, stats)
    // cold partitions: exact same files (name, length, mtime) — NOT rewritten
    coldDirs.foreach(d => assert(fileIdent(d) == coldIdentBefore(d), d))
    // hot partitions: actually compacted (64MB target => 1 file each)
    val filesAfter = countFiles(store)
    (filesBefore.keySet -- coldDirs).foreach { d =>
      assert(filesAfter.get(d).contains(1), s"$d -> ${filesAfter.get(d)}")
    }
    assert(stats.filesAfter < stats.filesBefore, stats)
    // content preserved row-for-row across the swap
    val afterContent = spark.read.parquet(store).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count().collect().toSet
    assert(afterContent == beforeContent)
    // staging residue removed
    assert(!new java.io.File(store + "_compact_staging").exists())
    // idempotence of the no-op case: nothing left above the threshold
    val stats2 = TripleEmitter.compactIncremental(spark, store, maxFilesPerPred = thr,
      targetBytes = 64L * 1024 * 1024)
    assert(stats2.predsCompacted.isEmpty && stats2.untouchedPreserved)
  }

  test("compactIncremental: re-run after a mid-swap crash recovers the staged-only partition") {
    import spark.implicits._
    val triples = (
      (1 to 800).map(i => (s"turn$i", "mentions", s"e${i % 31}")) ++
      (1 to 50).map(i => (s"e$i", "type", "disease"))
    ).toDF("subj", "pred", "obj")
      .withColumn("props", map().cast("map<string,string>"))
    val store = "/tmp/graft_test_inccompact_crash"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(store + "_compact_staging"))
    triples.repartition(8).write.mode("overwrite").partitionBy("pred").parquet(store)
    val beforeContent = spark.read.parquet(store).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count().collect().toSet

    // simulate the crash window between the swap's delete and rename: the
    // hot pred's rows exist ONLY in staging (live dir gone). Moving the
    // live dir wholesale is content-faithful — the staged dir at that
    // point holds the same rows, just re-packed.
    val staged = new java.io.File(store + "_compact_staging/pred=mentions")
    staged.getParentFile.mkdirs()
    assert(new java.io.File(s"$store/pred=mentions").renameTo(staged))
    assert(!new java.io.File(s"$store/pred=mentions").exists())

    // the natural recovery action is just re-running the compaction; the
    // entry sweep must complete the interrupted swap, not delete the sole
    // copy (threshold high: this run itself compacts nothing)
    val stats = TripleEmitter.compactIncremental(spark, store,
      maxFilesPerPred = 1000L, targetBytes = 64L * 1024 * 1024)
    assert(stats.predsCompacted.isEmpty, stats)
    val afterContent = spark.read.parquet(store).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count().collect().toSet
    assert(afterContent == beforeContent, "staged-only rows must be recovered")
    assert(!new java.io.File(store + "_compact_staging").exists())

    // redundant-staged case (crash BEFORE the delete): live dir intact, a
    // staged copy left over — recovery keeps the live rows and discards
    // the redundant copy without duplicating anything
    val staged2 = new java.io.File(store + "_compact_staging/pred=type")
    staged2.getParentFile.mkdirs()
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$store/pred=type"), staged2)
    TripleEmitter.compactIncremental(spark, store,
      maxFilesPerPred = 1000L, targetBytes = 64L * 1024 * 1024)
    val afterContent2 = spark.read.parquet(store).select("subj", "pred", "obj")
      .groupBy("subj", "pred", "obj").count().collect().toSet
    assert(afterContent2 == beforeContent, "redundant staging must not duplicate rows")
    assert(!new java.io.File(store + "_compact_staging").exists())
  }
}
