package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over append-only event streams — the time-series
  * queries an analytics engine needs once transcripts/decisions/events carry
  * timestamps: as-of (point-in-time) joins and gap-based sessionization.
  * Both are spelled the way that survives 100 TB: ONE hash exchange on the
  * entity key plus a per-partition sort, never an inequality join (Spark
  * plans `l.key = r.key AND r.ts <= l.ts` + argmax as a broadcast-nested-
  * loop or a per-key quadratic explosion), never a driver-side loop.
  * All pure Catalyst — window functions and codegen'd expressions, no UDFs.
  */
object Timeseries {

  /** Epoch milliseconds of a timestamp column. The explicit cast makes it
    * total over TIMESTAMP_NTZ too (parquet event times land as NTZ;
    * unix_millis alone rejects that type) — sessions pin UTC, so the
    * NTZ->instant reading is deterministic. */
  private[graft] def epochMs(c: Column): Column =
    unix_millis(c.cast("timestamp"))

  /** As-of join: for each left row, the LATEST right row with the same key
    * and `right.ts <= left.ts` (point-in-time lookup — "the state that was
    * current when this event happened"). The classic spelling merge_asof /
    * ASOF JOIN engines special-case; Spark has no native operator, so this
    * uses the union + last(ignoreNulls) window pattern:
    *
    *   1. tag right rows 0 / left rows 1, lift the right payload into one
    *      nullable struct (null on left rows);
    *   2. union and window PARTITION BY key ORDER BY (ts, tag, payload)
    *      ROWS UNBOUNDED PRECEDING..CURRENT: `last(payload, ignoreNulls)`
    *      hands every left row the most recent right payload at-or-before
    *      its ts (tag 0 < 1 puts a right row BEFORE a left row with the
    *      identical ts, giving <= rather than < semantics);
    *   3. keep the tagged-left rows, explode the struct back to columns.
    *
    * Cost: ONE exchange on `key` + one sort of left+right — linear in the
    * input, skew-bounded by the hottest key (same bound any per-key
    * operator has). The payload struct joins the sort key only to make
    * equal-(ts,tag) right duplicates deterministic (struct comparison is
    * total); nulls-first ordering on left rows is irrelevant because tag
    * already separates them. Inner semantics: left rows with no prior
    * right row are dropped (matches DuckDB `ASOF JOIN`); keep-unmatched is
    * the same plan minus the final filter.
    *
    * Output: every left column, then the right payload columns renamed
    * `asof_<name>` (with `asof_ts` the matched row's timestamp).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, keepUnmatched = false)

  /** LEFT as-of join: same point-in-time semantics, but left rows with no
    * prior right row are KEPT with null `asof_*` columns (DuckDB
    * `ASOF LEFT JOIN`) — the enrichment spelling where losing unmatched
    * facts is wrong (e.g. clicks before the user's first view). Identical
    * plan to `asofJoin` minus the match-is-not-null filter: still one key
    * exchange + one sort. */
  def asofJoinLeft(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, keepUnmatched = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, payloadCols: Seq[String],
                       keepUnmatched: Boolean): DataFrame = {
    val payNames = tsCol +: payloadCols
    val rightPrep = right.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"), lit(0).as("_tag"),
      struct(payNames.map(col): _*).as("_pay"))
    val payType = rightPrep.schema("_pay").dataType
    val leftCols = left.columns.toSeq
    val leftPrep = left.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"), lit(1).as("_tag"),
      lit(null).cast(payType).as("_pay"),
      struct(leftCols.map(col): _*).as("_row"))
    val rightAligned = rightPrep.withColumn("_row",
      lit(null).cast(leftPrep.schema("_row").dataType))

    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"), col("_pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keep =
      if (keepUnmatched) col("_tag") === 1
      else col("_tag") === 1 && col("_match").isNotNull
    val matched = leftPrep.unionByName(rightAligned)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(keep)
    val outCols =
      leftCols.map(c => col(s"_row.$c").as(c)) ++
        payNames.map(c => col(s"_match.$c").as(s"asof_$c"))
    matched.select(outCols: _*)
  }

  /** Epoch MICROseconds — parquet timestamps carry micros, so interval
    * comparisons happen at full precision (ms truncation would move rows
    * across a window boundary that lands mid-millisecond). */
  private[graft] def epochUs(c: Column): Column =
    unix_micros(c.cast("timestamp"))

  /** Range (interval) join: every (left, right) pair with the same key and
    * `left.ts + lowerMs <= right.ts <= left.ts + upperMs` (bounds
    * inclusive, compared at microsecond precision). The naive spelling —
    * an equi-join on key plus a BETWEEN on ts — Spark plans as a
    * SortMergeJoin on key with the interval as a post-join filter, which
    * is per-key quadratic (every click × every view of a hot user), and
    * without the key it degenerates to BroadcastNestedLoop. This is the
    * BUCKETED spelling that survives 100 TB:
    *
    *   1. bucket width W = the window length (upperMs - lowerMs), in
    *      micros; a window of length W overlaps at most TWO W-buckets;
    *   2. right rows land in bucket floor(ts/W) — one row each;
    *   3. left rows explode to the (at most two) buckets their window
    *      touches: sequence(floor((ts+lower)/W), floor((ts+upper)/W));
    *   4. equi-join on (key, bucket), then the exact BETWEEN filter.
    *
    * Cost: ONE exchange per side on (key, bucket) with the left at most
    * doubled — join fan-out is bounded by rows-per-bucket, not
    * rows-per-key, so a hot key's quadratic blow-up is cut by time
    * locality (the same reason Databricks' range-join hint bins). All
    * integer `div` arithmetic (epoch micros are positive, so truncating
    * div IS floor) — no doubles near bucket boundaries. Inner semantics:
    * left rows with no right row in their window are dropped.
    *
    * Output: every left column, then the right ts + payload columns
    * renamed `r_<name>`. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, lowerMs: Long, upperMs: Long,
                payloadCols: Seq[String]): DataFrame = {
    require(upperMs > lowerMs,
      s"rangeJoin: empty window [$lowerMs, $upperMs]")
    val leftCols = left.columns.toSeq
    // internal / output name collisions corrupt silently (withColumn
    // overwrites; a left column named like a renamed right payload makes
    // the final select ambiguous) — fail loud instead. The rewrite rule
    // guards its own path; the operator must too.
    Seq("_lus", "_b").foreach(nm => require(!leftCols.contains(nm),
      s"rangeJoin: left already has internal column '$nm'"))
    Seq("_rk", "_rus", "_b").foreach(nm => require(!right.columns.contains(nm),
      s"rangeJoin: right already has internal column '$nm'"))
    (tsCol +: payloadCols).map(c => s"r_$c").foreach(nm =>
      require(!leftCols.contains(nm),
        s"rangeJoin: left column '$nm' collides with a renamed right payload"))
    val wUs = (upperMs - lowerMs) * 1000L
    val loUs = lowerMs * 1000L
    val hiUs = upperMs * 1000L
    val l = left
      .withColumn("_lus", epochUs(col(tsCol)))
      .withColumn("_b", explode(sequence(
        expr(s"(_lus + $loUs) div $wUs"), expr(s"(_lus + $hiUs) div $wUs"))))
    val r = right.select(
      (col(keyCol).as("_rk") +: epochUs(col(tsCol)).as("_rus") +:
        (tsCol +: payloadCols).map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("_b", expr(s"_rus div $wUs"))
    l.join(r, l(keyCol) === r("_rk") && l("_b") === r("_b"))
      .filter(col("_rus").between(col("_lus") + loUs, col("_lus") + hiUs))
      .select(leftCols.map(col) ++
        (tsCol +: payloadCols).map(c => col(s"r_$c")): _*)
  }

  /** Gap-based sessionization: per key, a new session starts when the gap
    * to the previous event exceeds `gapSeconds` (strictly greater — an
    * exactly-gap delta continues the session). Adds `session_idx`
    * (1-based, in event-time order) to every row. One window pass —
    * lag + running sum over the same (key, ts, id) sort, one exchange. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val prevMs = lag(epochMs(col(tsCol)), 1).over(w)
    val newSession = when(
      prevMs.isNull ||
        epochMs(col(tsCol)) - prevMs > gapSeconds * 1000L, 1L)
      .otherwise(0L)
    events.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates over sessionize's assignment: bounds, event
    * count, and the value total. The groupBy keys (key, session_idx) are a
    * SUPERSET of the window's partition key, so Catalyst's EnsureRequirements
    * accepts the window's hashpartitioning(key) for the aggregate and the
    * whole operator runs on the sessionize exchange — one shuffle total
    * (plan-gated in PlanSpec). value sums travel as DECIMAL(18,6) so the
    * total is addition-order-independent — a double sum differs in the last
    * bit across partitionings/engines. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, gapSeconds: Long,
                   valueCol: String): DataFrame =
    sessionize(events, keyCol, tsCol, idCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(epochMs(col(tsCol))).as("start_ms"),
        max(epochMs(col(tsCol))).as("end_ms"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total_value"))
}
