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
}
