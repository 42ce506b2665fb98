package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Timeseries

/** Scale evidence for the bucketed range join: on a hot-key event stream,
  * the naive spelling (equi-join on the key with the interval as a join
  * filter) enumerates EVERY left×right pair of the hot key — per-key
  * quadratic — while the bucketed spelling bounds fan-out by time locality
  * (rows per (key, bucket)), which is what survives 100 TB of clickstream.
  *
  * Four measurements on a deterministic synthetic corpus (xxhash64 draws;
  * one planted hot user owning `hotRows` events, the rest uniform over
  * ~nEvents/100 users; timestamps uniform over 30 days; alternating
  * click/view):
  *
  *  1. equivalence + crossover at a size the naive plan can still finish:
  *     both spellings aggregated to (event_id, n_views, min/max lag) must
  *     be EXACTLY equal (except() both ways == 0), walls for both;
  *  2. the join-row accounting that explains the gap, computed exactly from
  *     the corpus (not sampled): naive enumerates Σ_key clicks_k × views_k
  *     pairs; bucketed enumerates Σ_(key,bucket) clicks_kb × views_kb
  *     (left exploded to <= 2 buckets). The ratio is the time-locality
  *     dividend — it GROWS with the hot key, which is the 100×-scale
  *     argument;
  *  3. the same naive SQL with the RangeJoinRewrite optimizer rule active
  *     (registered only after the naive run): the rule must FIRE, match
  *     the bucketed output exactly, and recover its wall — optimizer-
  *     derived performance from user SQL;
  *  4. a 10× corpus (10× hot key) where the naive plan's predicted pair
  *     enumeration is ~100× — bucketed only, wall + matched pairs.
  *
  * args: [cores] [nEvents] [hotRows] [windowMin]
  */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val nEvents = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val hotRows = args.lift(2).map(_.toLong).getOrElse(40000L)
    val windowMin = args.lift(3).map(_.toLong).getOrElse(60L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spanMs = 30L * 24 * 3600 * 1000 // 30 days
    val baseMs = 1704067200000L // 2024-01-01T00:00Z

    /** Deterministic event stream: ids < hot land on user -1 (the hot key),
      * the rest uniform; even ids click, odd ids view. */
    def events(n: Long, hot: Long, parts: Int): DataFrame =
      spark.range(0, n, 1, parts)
        .withColumn("user_id",
          when(col("id") < hot, lit(-1L))
            .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(n / 100 + 1))))
        .withColumn("ts", timestamp_millis(
          lit(baseMs) + pmod(xxhash64(col("id"), lit(2)), lit(spanMs))))
        .withColumn("event_type",
          when(col("id") % 2 === 0, lit("click")).otherwise(lit("view")))
        .select(col("id").as("event_id"), col("user_id"), col("ts"), col("event_type"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val lowerMs = -windowMin * 60000L
    def agg(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_views"),
        min(unix_millis(col("ts")) - unix_millis(col("r_ts"))).as("min_lag_ms"),
        max(unix_millis(col("ts")) - unix_millis(col("r_ts"))).as("max_lag_ms"))

    // ---- phase 1: equivalence + crossover at naive-finishable size
    val ev = events(nEvents, hotRows, cores.toInt * 4).persist()
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    ev.count()

    val (bucketed, tBucketed) = time {
      val b = agg(Timeseries.rangeJoin(
        clicks, views, "user_id", "ts", lowerMs, 0L, Seq("event_id"))).persist()
      b.count(); b
    }
    val nBucketed = bucketed.count()

    // the naive spelling: equi-join on the key, interval as a join filter —
    // Spark plans SMJ on user_id and enumerates every in-key pair
    val (naive, tNaive) = time {
      val v = views.select(col("user_id").as("vu"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
      val n = agg(clicks.join(v,
          col("user_id") === col("vu") &&
            col("r_ts").between(
              col("ts") - expr(s"INTERVAL $windowMin MINUTES"), col("ts")))
        .drop("vu")).persist()
      n.count(); n
    }
    val nNaive = naive.count()
    val diffs = bucketed.exceptAll(naive).count() + naive.exceptAll(bucketed).count()

    // ---- phase 1b: the SAME naive SQL a user would type, with the
    // RangeJoinRewrite optimizer rule active — registered only AFTER the
    // naive measurement above, so that one stayed naive. The rule must
    // recover the hand-bucketed plan (fired gate) and its wall, and the
    // output must be exactly the bucketed/naive result.
    graft.plans.RangeJoinRewrite.register(spark)
    clicks.createOrReplaceTempView("rb_clicks")
    views.createOrReplaceTempView("rb_views")
    val (ruled, tRuled) = time {
      val r = spark.sql(s"""
        SELECT c.event_id, c.user_id, count(*) AS n_views,
               min(unix_millis(c.ts) - unix_millis(v.ts)) AS min_lag_ms,
               max(unix_millis(c.ts) - unix_millis(v.ts)) AS max_lag_ms
        FROM (SELECT event_id, user_id, unix_micros(ts) AS tus, ts FROM rb_clicks) c
        JOIN (SELECT user_id, unix_micros(ts) AS tus, ts FROM rb_views) v
          ON c.user_id = v.user_id
         AND v.tus >= c.tus + ${lowerMs * 1000L} AND v.tus <= c.tus
        GROUP BY c.event_id, c.user_id""").persist()
      r.count(); r
    }
    val ruleFired = ruled.queryExecution.optimizedPlan.toString
      .contains(graft.plans.RangeJoinRewrite.bucketName)
    val ruledDiffs =
      ruled.exceptAll(bucketed).count() + bucketed.exceptAll(ruled).count()
    ruled.unpersist(false)

    // exact join-row accounting from the corpus itself
    val wUs = windowMin * 60000L * 1000L
    val ck = clicks.groupBy("user_id").agg(count(lit(1)).as("c"))
    val vk = views.groupBy("user_id").agg(count(lit(1)).as("v"))
    val naiveRows = ck.join(vk, "user_id")
      .agg(sum(col("c") * col("v"))).head().getLong(0)
    // bucketed: left rows explode to (at most) the two buckets the window
    // touches; count per-(key, bucket) products over the exploded left
    val cb = clicks
      .withColumn("_lus", unix_micros(col("ts")))
      .withColumn("b", explode(sequence(
        expr(s"(_lus + ${lowerMs * 1000L}) div $wUs"), expr(s"_lus div $wUs"))))
      .groupBy("user_id", "b").agg(count(lit(1)).as("c"))
    val vb = views
      .withColumn("b", expr(s"unix_micros(ts) div $wUs"))
      .groupBy("user_id", "b").agg(count(lit(1)).as("v"))
    val bucketRows = cb.join(vb, Seq("user_id", "b"))
      .agg(sum(col("c") * col("v"))).head().getLong(0)
    bucketed.unpersist(false); naive.unpersist(false); ev.unpersist(false)

    // ---- phase 2: 10× corpus, 10× hot key — bucketed only (the naive
    // plan's predicted enumeration is ~100× phase 1's)
    val ev10 = events(nEvents * 10, hotRows * 10, cores.toInt * 4).persist()
    val c10 = ev10.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val v10 = ev10.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    ev10.count()
    val (n10, t10) = time {
      agg(Timeseries.rangeJoin(
        c10, v10, "user_id", "ts", lowerMs, 0L, Seq("event_id"))).count()
    }
    ev10.unpersist(false)

    println(f"""{"n_events":$nEvents,"hot_rows":$hotRows,"window_min":$windowMin,"bucketed_sec":$tBucketed%.2f,"naive_sec":$tNaive%.2f,"ruled_sql_sec":$tRuled%.2f,"rule_fired":$ruleFired,"ruled_diffs":$ruledDiffs,"bucketed_groups":$nBucketed,"naive_groups":$nNaive,"diffs":$diffs,"join_rows_naive":$naiveRows,"join_rows_bucketed":$bucketRows,"locality_ratio":${naiveRows.toDouble / bucketRows}%.1f,"n_events_10x":${nEvents * 10},"bucketed_10x_sec":$t10%.2f,"bucketed_10x_groups":$n10}""")
    spark.stop()
  }
}
