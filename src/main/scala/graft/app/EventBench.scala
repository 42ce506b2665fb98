package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Timeseries

/** Scale + exactness evidence for the event-time operators beyond the
  * range join (which has RangeBench): the AS-OF join and gap
  * SESSIONIZATION on the same hot-key clickstream shape — >= 5M events,
  * one planted user owning `hotRows` of them (the skew case that breaks
  * naive per-key spellings). Three claims, each measured, none asserted
  * from plausibility:
  *
  *  1. WALL at scale for both operators (the full 5M-row corpus, hot key
  *     included);
  *  2. the ONE-EXCHANGE plan survives at scale: the executed plan of each
  *     operator is counted for shuffle Exchanges — as-of's union+window
  *     must shuffle exactly once on the key, and sessionStats' aggregate
  *     must reuse the sessionize window's exchange (1 total);
  *  3. an EXACT referee: for the hot user plus `nSample` uniform users,
  *     both operators are recomputed driver-side from first principles
  *     (two-pointer as-of over (ts, event_id)-sorted views with the
  *     window's tie semantics; linear gap-scan sessionization), and every
  *     engine row for those keys must match — mismatches print per
  *     operator and must be 0.
  *
  * The corpus is the RangeBench generator plus an exact integer-valued
  * `value` column (so the DECIMAL session total is reproducible
  * driver-side without float-rounding caveats).
  *
  * args: [cores] [nEvents] [hotRows] [gapSeconds] [nSample]
  */
object EventBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val nEvents = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val hotRows = args.lift(2).map(_.toLong).getOrElse(40000L)
    val gapSeconds = args.lift(3).map(_.toLong).getOrElse(3600L)
    val nSample = args.lift(4).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spanMs = 30L * 24 * 3600 * 1000
    val baseMs = 1704067200000L
    val nUsers = nEvents / 100 + 1

    def events(n: Long, hot: Long, parts: Int): DataFrame =
      spark.range(0, n, 1, parts)
        .withColumn("user_id",
          when(col("id") < hot, lit(-1L))
            .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(nUsers))))
        .withColumn("ts", timestamp_millis(
          lit(baseMs) + pmod(xxhash64(col("id"), lit(2)), lit(spanMs))))
        .withColumn("event_type",
          when(col("id") % 2 === 0, lit("click")).otherwise(lit("view")))
        .withColumn("value", pmod(xxhash64(col("id"), lit(3)), lit(1000L))
          .cast("double"))
        .select(col("id").as("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // the PlanSpec counting spelling: formatted-mode plans number every
    // operator, so "(N) Exchange" counts each shuffle exactly once.
    // Counted on a FRESH (unexecuted, unpersisted) frame — after AQE
    // execution the dump nests final+initial sections and a cached frame
    // hides its compute plan behind the InMemoryRelation wrapper.
    def nExchanges(df: DataFrame): Int = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      "\\(\\d+\\) Exchange".r.findAllIn(p).size
    }

    val debugPlans = sys.env.contains("GRAFT_EVENTBENCH_PLANS")
    val ev = events(nEvents, hotRows, cores.toInt * 4).persist()
    ev.count()
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")

    // ---- as-of at scale (plan counted BEFORE the result is cached — a
    // cache hit would substitute InMemoryRelation and nest the stored
    // final+initial AQE sections into the dump)
    val asofEx = nExchanges(
      Timeseries.asofJoin(clicks, views, "user_id", "ts", Seq("event_id")))
    val (asof, tAsof) = time {
      val a = Timeseries.asofJoin(clicks, views, "user_id", "ts", Seq("event_id"))
        .persist()
      a.count(); a
    }
    val nAsof = asof.count()
    if (debugPlans) System.err.println(asof.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    // ---- sessionization at scale (plan counted pre-cache, as above)
    val sessEx = nExchanges(Timeseries.sessionStats(
      ev, "user_id", "ts", "event_id", gapSeconds, "value"))
    val (sess, tSess) = time {
      val s = Timeseries.sessionStats(ev, "user_id", "ts", "event_id",
        gapSeconds, "value").persist()
      s.count(); s
    }
    val nSess = sess.count()

    // ---- exact referees on the hot key + nSample uniform keys
    val sampleKeys = -1L +: (1 to nSample).map(i =>
      Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"k$i").toLong,
        nUsers))
    val keySet = sampleKeys.toSet

    final case class Ev(id: Long, ts: Long, typ: String, value: Long)
    val sliceRows = ev.filter(col("user_id").isin(sampleKeys: _*))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"),
        col("value").cast("long"))
      .collect()
      .map(r => (r.getLong(0), Ev(r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toVector }

    // as-of model: views sorted by (ts, id); for each click the LAST view
    // with vts <= cts in that order (== the window's last(ignoreNulls) with
    // tag 0 before tag 1 at equal ts and max payload struct among ties)
    var asofMismatch = 0L
    val modelAsof = scala.collection.mutable.Map[Long, Long]() // click id -> view id
    sliceRows.foreach { case (_, evs) =>
      val vs = evs.filter(_.typ == "view").sortBy(e => (e.ts, e.id))
      val cs = evs.filter(_.typ == "click").sortBy(e => (e.ts, e.id))
      var vi = 0
      var cur = -1
      cs.foreach { c =>
        while (vi < vs.length && vs(vi).ts <= c.ts) { cur = vi; vi += 1 }
        if (cur >= 0) modelAsof(c.id) = vs(cur).id
      }
    }
    val engineAsof = asof.filter(col("user_id").isin(sampleKeys: _*))
      .select(col("event_id"), col("asof_event_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    asofMismatch += engineAsof.count { case (c, v) => !modelAsof.get(c).contains(v) }
    asofMismatch += modelAsof.count { case (c, _) => !engineAsof.contains(c) }

    // sessionization model: linear gap scan over (ts, id) order; rows are
    // (key, session_idx, n_events, start_ms, end_ms, total_value-as-long)
    val modelSess = scala.collection.mutable.Set[(Long, Long, Long, Long, Long, Long)]()
    sliceRows.foreach { case (k, evs) =>
      val es = evs.sortBy(e => (e.ts, e.id))
      var idx = 0L
      var prev = Long.MinValue
      var bucket = Vector.empty[Ev]
      def flush(): Unit = if (bucket.nonEmpty)
        modelSess += ((k, idx, bucket.size.toLong, bucket.head.ts,
          bucket.last.ts, bucket.map(_.value).sum))
      es.foreach { e =>
        if (prev == Long.MinValue || e.ts - prev > gapSeconds * 1000L) {
          flush(); idx += 1; bucket = Vector.empty
        }
        bucket = bucket :+ e
        prev = e.ts
      }
      flush()
    }
    val engineSess = sess.filter(col("user_id").isin(sampleKeys: _*))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_ms"), col("end_ms"), col("total_value").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val sessMismatch =
      (engineSess -- modelSess).size + (modelSess -- engineSess).size

    val hotSessions = engineSess.count(_._1 == -1L)
    asof.unpersist(false); sess.unpersist(false); ev.unpersist(false)

    println(f"""{"n_events":$nEvents,"hot_rows":$hotRows,"gap_s":$gapSeconds,"asof_sec":$tAsof%.2f,"asof_rows":$nAsof,"asof_exchanges":$asofEx,"asof_ref_keys":${keySet.size},"asof_ref_mismatches":$asofMismatch,"sessions_sec":$tSess%.2f,"session_rows":$nSess,"sessions_exchanges":$sessEx,"hot_key_sessions":$hotSessions,"sessions_ref_mismatches":$sessMismatch}""")
    spark.stop()
  }
}
