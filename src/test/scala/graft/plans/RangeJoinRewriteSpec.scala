package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + firing pins for the interval-join optimizer rewrite: the
  * naive SQL must produce EXACTLY the brute-force pair set before and after
  * the rule registers (the rewrite is a plan change, never a result
  * change), the optimized plan must actually carry the bucket attribute
  * (no silent no-op), and the rule must stand down on shapes it cannot
  * serve (single-sided bounds). Negative epochs are planted to pin the
  * (x - pmod(x, W)) div W floor division — plain `div` truncates toward
  * zero and would mis-bucket pre-1970 timestamps. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // hot user 1 (many clicks x many views), sparse user 2, view-less user 3,
  // and user 4 entirely in NEGATIVE epoch territory; boundary ties planted
  // (view exactly at click ts and exactly at click ts - 100)
  private val clicks = Seq(
    (10L, 1L, 0L), (11L, 1L, 50L), (12L, 1L, 100L), (13L, 1L, 1000L),
    (20L, 2L, 500L),
    (30L, 3L, 500L),
    (40L, 4L, -250L), (41L, 4L, -175L))
  private val views = Seq(
    (1L, -100L, 1.0), (1L, 0L, 2.0), (1L, 40L, 3.0), (1L, 99L, 4.0),
    (1L, 950L, 5.0),
    (2L, 401L, 6.0), (2L, 399L, 7.0),
    (4L, -300L, 8.0), (4L, -351L, 9.0))

  private def brute: Set[(Long, Long, Long)] =
    (for {
      (eid, u, ct) <- clicks
      (vu, vt, _) <- views
      if vu == u && vt >= ct - 100L && vt <= ct
    } yield (eid, u, vt)).toSet

  private def setup(): Unit = {
    import spark.implicits._
    clicks.toDF("event_id", "user_id", "tus").createOrReplaceTempView("clicks_rjr")
    views.toDF("user_id", "tus", "value").createOrReplaceTempView("views_rjr")
  }

  private val naiveSql =
    """SELECT c.event_id, c.user_id, v.tus AS v_tus
      |FROM clicks_rjr c JOIN views_rjr v
      |  ON c.user_id = v.user_id
      | AND v.tus >= c.tus - 100 AND v.tus <= c.tus""".stripMargin

  private def run(sql: String): Set[(Long, Long, Long)] =
    spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("naive interval join: rewritten plan, brute-force-identical pair set") {
    // NOTE: no "rule not yet registered" assertion — other suites sharing
    // this JVM's session (PlanSpec's ev_range_join_sql) may have registered
    // it already; the semantic claim is register-order-independent
    setup()
    val expected = brute
    assert(expected.nonEmpty && expected.exists(_._2 == 4L)) // negative epochs covered
    RangeJoinRewrite.register(spark)
    RangeJoinRewrite.register(spark) // idempotent: no duplicate rule entry
    assert(spark.experimental.extraOptimizations
      .count(_ eq RangeJoinRewrite) == 1)
    val after = run(naiveSql)
    assert(after == expected)
    val plan = spark.sql(naiveSql).queryExecution.optimizedPlan.toString
    assert(plan.contains(RangeJoinRewrite.bucketName), plan)
  }

  test("BETWEEN sugar fires the same rewrite") {
    setup()
    RangeJoinRewrite.register(spark)
    val sql =
      """SELECT c.event_id, c.user_id, v.tus AS v_tus
        |FROM clicks_rjr c JOIN views_rjr v
        |  ON c.user_id = v.user_id
        | AND v.tus BETWEEN c.tus - 100 AND c.tus""".stripMargin
    assert(run(sql) == brute)
    assert(spark.sql(sql).queryExecution.optimizedPlan.toString
      .contains(RangeJoinRewrite.bucketName))
  }

  test("timestamp INTERVAL spelling fires: LTZ and NTZ, brute-parity at micros grain") {
    // tus values are MILLIS here; views at ms m land at micros m*1000, so
    // the 100ms window maps to INTERVAL '0.1' SECOND exactly
    import spark.implicits._
    RangeJoinRewrite.register(spark)
    clicks.map { case (e, u, t) => (e, u, new java.sql.Timestamp(t)) }
      .toDF("event_id", "user_id", "ts").createOrReplaceTempView("clicks_ts")
    views.map { case (u, t, v) => (u, new java.sql.Timestamp(t), v) }
      .toDF("user_id", "ts", "value").createOrReplaceTempView("views_ts")
    val sqlLtz =
      """SELECT c.event_id, c.user_id, unix_millis(v.ts) AS v_ms
        |FROM clicks_ts c JOIN views_ts v
        |  ON c.user_id = v.user_id
        | AND v.ts BETWEEN c.ts - INTERVAL '0.1' SECOND AND c.ts""".stripMargin
    assert(run(sqlLtz) == brute.map { case (e, u, vt) => (e, u, vt) })
    assert(spark.sql(sqlLtz).queryExecution.optimizedPlan.toString
      .contains(RangeJoinRewrite.bucketName),
      spark.sql(sqlLtz).queryExecution.optimizedPlan.toString.take(2000))
    // NTZ columns (the parquet norm) go through the explicit-zone cast path
    spark.sql("SELECT event_id, user_id, CAST(ts AS TIMESTAMP_NTZ) AS ts FROM clicks_ts")
      .createOrReplaceTempView("clicks_ntz")
    spark.sql("SELECT user_id, CAST(ts AS TIMESTAMP_NTZ) AS ts, value FROM views_ts")
      .createOrReplaceTempView("views_ntz")
    val sqlNtz = sqlLtz.replace("clicks_ts", "clicks_ntz").replace("views_ts", "views_ntz")
      .replace("unix_millis(v.ts)", "unix_millis(CAST(v.ts AS TIMESTAMP))")
    assert(run(sqlNtz) == brute.map { case (e, u, vt) => (e, u, vt) })
    assert(spark.sql(sqlNtz).queryExecution.optimizedPlan.toString
      .contains(RangeJoinRewrite.bucketName))
  }

  test("NTZ buckets are shift-invariant: DST fall-back pairs survive in non-UTC sessions") {
    // NTZ comparisons live in the LOCAL domain; bucketing through the
    // SESSION zone is monotone but not shift-invariant — on the 2025-11-02
    // America/New_York fall-back, local 01:45 -> 05:45Z (EDT) while local
    // 02:30 -> 07:30Z (EST): a 45-minute local gap becomes 105 instant
    // minutes, the 1-hour window straddles 3 buckets, and the pair is
    // silently dropped. The fixed-"UTC" cast (local micros) keeps it.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      RangeJoinRewrite.register(spark)
      spark.sql("""SELECT * FROM VALUES
        (1, 1, TIMESTAMP_NTZ '2025-11-02 02:30:00') AS t(event_id, user_id, ts)""")
        .createOrReplaceTempView("clicks_dst")
      spark.sql("""SELECT * FROM VALUES
        (1, TIMESTAMP_NTZ '2025-11-02 01:45:00', 1.0) AS t(user_id, ts, value)""")
        .createOrReplaceTempView("views_dst")
      val sql =
        """SELECT c.event_id, v.ts FROM clicks_dst c JOIN views_dst v
          |  ON c.user_id = v.user_id
          | AND v.ts BETWEEN c.ts - INTERVAL '1' HOUR AND c.ts""".stripMargin
      val out = spark.sql(sql)
      assert(out.queryExecution.optimizedPlan.toString
        .contains(RangeJoinRewrite.bucketName))
      assert(out.count() == 1L, "DST fall-back pair must survive the bucket rewrite")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("stands down on single-sided bounds and on equi-only joins") {
    setup()
    RangeJoinRewrite.register(spark)
    val oneSided =
      """SELECT c.event_id, v.tus FROM clicks_rjr c JOIN views_rjr v
        |  ON c.user_id = v.user_id AND v.tus <= c.tus""".stripMargin
    assert(!spark.sql(oneSided).queryExecution.optimizedPlan.toString
      .contains(RangeJoinRewrite.bucketName))
    val equiOnly =
      """SELECT c.event_id, v.tus FROM clicks_rjr c JOIN views_rjr v
        |  ON c.user_id = v.user_id""".stripMargin
    assert(!spark.sql(equiOnly).queryExecution.optimizedPlan.toString
      .contains(RangeJoinRewrite.bucketName))
  }

  test("hand-spelled Timeseries.rangeJoin is left untouched (internal-name guard)") {
    import graft.operators.Timeseries
    import org.apache.spark.sql.functions._
    import spark.implicits._
    RangeJoinRewrite.register(spark)
    val l = clicks.map { case (e, u, t) => (e, u, new java.sql.Timestamp(t / 1000L)) }
      .toDF("event_id", "user_id", "ts")
    val r = views.map { case (u, t, v) => (u, new java.sql.Timestamp(t / 1000L), v) }
      .toDF("user_id", "ts", "value")
    val out = Timeseries.rangeJoin(l, r, "user_id", "ts", -3600L, 0L, Seq("value"))
    // exactly one bucket join layer: the operator's own `_b`, not the rule's
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains(RangeJoinRewrite.bucketName), plan)
  }
}
