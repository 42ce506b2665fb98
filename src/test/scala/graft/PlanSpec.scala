package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality gates: the physical plans the 100TB story depends on are
  * asserted, not just eyeballed — predicate pushdown reaching the parquet
  * scan, column pruning in ReadSchema, broadcast joins on dimension sides,
  * whole-stage codegen over the column math. Runs against the sf0.001
  * driver tables (read-only). */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("s3_filter_type: the lang predicate is pushed into the parquet scan") {
    val p = plan("s3_filter_type")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(lang,en)"), p.take(2000))
  }

  test("s1_scan_order: column pruning — the wide text column never leaves the scan") {
    val p = plan("s1_scan_order")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("n_chars") && !read.contains("text"), read)
  }

  test("s7_onehop_join: the dimension side is broadcast, not shuffled") {
    val p = plan("s7_onehop_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q1_pricing_summary: map-side partial aggregation before one exchange") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(2000))
    // partial (map-side) combine runs before the shuffle: only pre-agged
    // rows cross the exchange
    assert(p.contains("partial_sum"), p.take(2000))
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, "expected exactly one exchange")
  }

  test("corpus_pack_blocks: per-stratum window, no global sort — one hash exchange") {
    val p = plan("corpus_pack_blocks")
    assert(p.contains("Window"), p.take(2000))
    // a corpus-wide cumsum would need a single-partition global sort
    // (Exchange SinglePartition / rangepartitioning); per-stratum packing
    // hash-partitions by lang instead
    assert(!p.contains("SinglePartition"), "global single-partition exchange found")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, "expected exactly one exchange")
    assert(p.contains("hashpartitioning(lang"), p.take(2000))
  }

  test("j5_multijoin_revenue: small dims broadcast; fact join keys pushed as IsNotNull") {
    val p = plan("j5_multijoin_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull("))
  }
}
