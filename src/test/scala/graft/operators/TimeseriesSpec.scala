package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the event-time operators (as-of join, sessionization)
  * and the 2-hop graph reads: a brute-force in-memory model decides every
  * edge case (equal timestamps, right-side duplicates, boundary gaps), the
  * distributed operator must agree row for row — including determinism
  * under re-partitioning. */
class TimeseriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(ms: Long) = new Timestamp(ms)

  // (key, ts_ms, id, value) — ties and boundaries planted on purpose:
  //  - a left event EXACTLY at a right event's ts (<= semantics: matches it)
  //  - two right rows at the SAME (key, ts) (determinism: max payload wins)
  //  - a left event BEFORE any right event (inner semantics: dropped)
  private val rightRows = Seq(
    (1L, 1000L, 10L, 1.0), (1L, 5000L, 11L, 2.0), (1L, 5000L, 12L, 3.0),
    (1L, 9000L, 13L, 4.0),
    (2L, 4000L, 20L, 5.0),
    (3L, 7000L, 30L, 6.0))
  private val leftRows = Seq(
    (1L, 500L, 100L), // before any right row for key 1 -> dropped
    (1L, 1000L, 101L), // exactly at right ts 1000 -> matches id 10
    (1L, 5000L, 102L), // at the duplicated ts -> deterministic max payload (id 12)
    (1L, 6000L, 103L), // between -> latest at-or-before is the dup ts winner
    (1L, 20000L, 104L), // after everything -> id 13
    (2L, 3000L, 200L), // before key-2's only right row -> dropped
    (2L, 4500L, 201L), // -> id 20
    (4L, 1000L, 400L)) // key with no right rows at all -> dropped

  private def leftDf: DataFrame = {
    import spark.implicits._
    leftRows.map { case (k, t, id) => (id, k, ts(t)) }
      .toDF("event_id", "user_id", "ts")
  }
  private def rightDf: DataFrame = {
    import spark.implicits._
    rightRows.map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  /** Brute-force model: latest right row with r.ts <= l.ts; ties on ts break
    * by the payload struct order (ts, event_id, value) — max wins. */
  private def bruteAsof: Map[Long, (Long, Long, Double)] =
    leftRows.flatMap { case (k, lt, lid) =>
      val cand = rightRows.filter { case (rk, rt, _, _) => rk == k && rt <= lt }
      if (cand.isEmpty) None
      else {
        val (_, rt, rid, rv) = cand.maxBy { case (_, rt, rid, rv) => (rt, rid, rv) }
        Some(lid -> ((rt, rid, rv)))
      }
    }.toMap

  test("asofJoin matches the brute-force model on every planted edge case") {
    val out = Timeseries
      .asofJoin(leftDf, rightDf, "user_id", "ts", Seq("event_id", "value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Timestamp]("asof_ts").getTime,
          r.getAs[Long]("asof_event_id"), r.getAs[Double]("asof_value"))))
      .toMap
    assert(out == bruteAsof, s"engine=$out\nbrute=$bruteAsof")
    // the specific pins the comment block promises
    assert(!out.contains(100L) && !out.contains(200L) && !out.contains(400L))
    assert(out(101L)._2 == 10L, "equal-ts left row must match (<=, not <)")
    assert(out(102L)._2 == 12L, "right duplicates at one ts: max payload wins")
    assert(out(104L)._2 == 13L)
  }

  test("asofJoinLeft keeps unmatched left rows with null asof columns") {
    val out = Timeseries
      .asofJoinLeft(leftDf, rightDf, "user_id", "ts", Seq("event_id", "value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(at =>
          (at.getTime, r.getAs[Long]("asof_event_id"), r.getAs[Double]("asof_value"))))
      .toMap
    // EVERY left row survives; matched rows agree with the inner join's
    // brute model; the three unmatched rows carry nulls
    assert(out.keySet == leftRows.map(_._3).toSet)
    assert(out.collect { case (k, Some(v)) => k -> v }.toMap == bruteAsof)
    assert(Seq(100L, 200L, 400L).forall(out(_).isEmpty))
  }

  test("asofJoin is deterministic under re-partitioning") {
    val a = Timeseries
      .asofJoin(leftDf.repartition(7), rightDf.repartition(3),
        "user_id", "ts", Seq("event_id", "value"))
      .collect().map(_.toSeq).toSet
    val b = Timeseries
      .asofJoin(leftDf.coalesce(1), rightDf.coalesce(1),
        "user_id", "ts", Seq("event_id", "value"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("sessionize: strictly-greater gap breaks; exact gap continues; 1-based idx") {
    import spark.implicits._
    val gap = 10L // seconds
    val ev = Seq(
      (1L, 0L, 1L), (1L, 10000L, 2L), // exactly 10s -> SAME session
      (1L, 20001L, 3L), // 10.001s -> NEW session
      (1L, 25000L, 4L),
      (2L, 0L, 5L)) // other key: its own numbering
      .map { case (k, t, id) => (k, ts(t), id, 1.0) }
      .toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.sessionize(ev, "user_id", "ts", "event_id", gap)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L), out)

    val stats = Timeseries
      .sessionStats(ev, "user_id", "ts", "event_id", gap, "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(stats((1L, 1L)) == ((2L, 0L, 10000L, 2.0)))
    assert(stats((1L, 2L)) == ((2L, 20001L, 25000L, 2.0)))
    assert(stats((2L, 1L)) == ((1L, 0L, 0L, 1.0)))
  }

  private def triples: DataFrame = {
    import spark.implicits._
    Seq(
      ("turn1", "mentions", "e1"), ("turn1", "mentions", "e2"),
      ("turn1", "mentions", "e3"),
      ("turn2", "mentions", "e1"), ("turn2", "mentions", "e2"),
      ("turn3", "mentions", "e9"), // e9 has no type edge (created entity)
      ("e1", "type", "disease"), ("e2", "type", "drug"),
      ("e3", "type", "disease"),
      ("e1", "alias", "x")) // non-mention/type edges must be ignored
      .toDF("subj", "pred", "obj")
  }

  test("coMentions: pairs through the turn hub, a<b orientation, support counts") {
    val out = GraphOps.coMentions(triples).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("e1", "e2") -> 2L, ("e1", "e3") -> 1L, ("e2", "e3") -> 1L), out)
  }

  test("comentionLift: exact integer ppm, above/below the independence line") {
    import spark.implicits._
    // a,b co-occur in 2 of their 3 turns each (positively associated);
    // a,c co-occur once against c's 2 turns (below independence)
    val t = Seq(
      ("t1", "mentions", "a"), ("t1", "mentions", "b"),
      ("t2", "mentions", "a"), ("t2", "mentions", "b"),
      ("t3", "mentions", "a"), ("t3", "mentions", "c"),
      ("t4", "mentions", "b"), ("t5", "mentions", "c"))
      .toDF("subj", "pred", "obj")
    val out = GraphOps.comentionLift(t, GraphOps.coMentions(t)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // n_turns=5; c_a=3, c_b=3, c_c=2
    // lift(a,b) = (2*5*1e6) div (3*3) = 1,111,111 ppm (> 1e6: associated)
    // lift(a,c) = (1*5*1e6) div (3*2) =   833,333 ppm (< 1e6: anti)
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 3L, 5L, 1111111L)),
      ("a", "c") -> ((1L, 3L, 2L, 5L, 833333L))), out)
  }

  test("twoHopTypes: mention volume per ontology type; untyped mentions drop") {
    val out = GraphOps.twoHopTypes(triples).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // disease: e1 (turn1, turn2) + e3 (turn1) = 3 mentions over 2 turns;
    // drug: e2 twice; e9 (no type) contributes nothing
    assert(out == Map("disease" -> ((3L, 2L)), "drug" -> ((2L, 2L))), out)
  }

  /** Driver-side fixed-point PageRank — the independent model the
    * distributed operator must match to the last unit. */
  private def brutePageRank(edges: Seq[(String, String)], iters: Int,
                            scale: Long): Map[String, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size
    val tele = (15L * (scale / n)) / 100L
    var r = deg.keys.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = contrib.map { case (v, s) => v -> (tele + (85L * s) / 100L) }
    }
    r
  }

  test("pageRankFp matches the brute-force fixed-point model to the unit") {
    import spark.implicits._
    // undirected triangle + pendant: {a-b, b-c, c-a, c-d} symmetric
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val sym = und ++ und.map(_.swap)
    val out = GraphOps.pageRankFp(sym.toDF("src", "dst"), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val model = brutePageRank(sym, 5, 1000000000000L)
    assert(out == model, s"engine=$out\nmodel=$model")
    // sanity on the semantics the units encode: c (deg 3) outranks the
    // pendant d (deg 1), and total mass stays within truncation loss of 1.0
    assert(out("c") > out("d"))
    val mass = out.values.sum
    assert(mass <= 1000000000000L && mass > 999000000000L, mass)
  }

  test("triangleCounts matches brute-force enumeration (hubs, ties, orientation-independence)") {
    import spark.implicits._
    // K4 on {a,b,c,d} (4 triangles, every vertex in 3), a pendant edge
    // (d-e: no triangle), and a separate triangle {f,g,h}; degree ties
    // everywhere in the second component exercise the (deg, id) tie-break
    val und = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"),
      ("f", "g"), ("f", "h"), ("g", "h"))
    val brute = {
      val es = und.toSet
      def edge(x: String, y: String) =
        es(if (x < y) (x, y) else (y, x))
      val vs = und.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val tris = for {
        i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
        if edge(vs(i), vs(j)) && edge(vs(i), vs(k)) && edge(vs(j), vs(k))
      } yield Seq(vs(i), vs(j), vs(k))
      tris.flatten.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    }
    val out = GraphOps.triangleCounts(und.toDF("a", "b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == brute, s"engine=$out\nbrute=$brute")
    assert(out("a") == 3L && out("f") == 1L && !out.contains("e"))
  }

  test("GraftApi.relatedEntities: direct co-mention partners plus neighborhood similars") {
    val out = graft.api.GraftApi.relatedEntities(triples, "e1").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // direct: e2 in 2 shared turns, e3 in 1; similar: both at jaccard 1/3
    // (N(e1)={e2,e3}, N(e2)={e1,e3}, N(e3)={e1,e2}); e9 (isolated) absent
    assert(out == Map(
      ("e2", "comention") -> 2.0, ("e3", "comention") -> 1.0,
      ("e2", "similar") -> 1.0 / 3, ("e3", "similar") -> 1.0 / 3), out)
  }

  test("neighborSimilarity: jaccard over neighbor sets, tau-filtered, hand-checked") {
    import spark.implicits._
    // N(a)={b,c} N(b)={a,c} N(c)={a,b,d} N(d)={c}: (a,d) and (b,d) share
    // only c but have tiny unions -> 1/2; (a,b)=1/3; (a,c)=(b,c)=1/4;
    // (c,d) shares NO neighbor and must not appear at any tau. tau=0.4
    // keeps only the 1/2 pairs; tau=0.2 admits all four below it
    val und = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val out = GraphOps.neighborSimilarity(und, 0.4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out == Map(("a", "d") -> 0.5, ("b", "d") -> 0.5), out)
    val loose = GraphOps.neighborSimilarity(und, 0.2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(loose == Map(
      ("a", "d") -> 0.5, ("b", "d") -> 0.5, ("a", "b") -> 1.0 / 3,
      ("a", "c") -> 0.25, ("b", "c") -> 0.25), loose)
  }

  test("pageRankFp is bit-identical across parallelism and repartitioning") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val a = GraphOps.pageRankFp(sym.repartition(13), 7).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val b = GraphOps.pageRankFp(sym.coalesce(1), 7).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  /** Driver-side mirror of pageRankDirected's integer recurrence: dangling
    * mass (sinks' summed rank div N) joins every node's 85% term; nodes
    * with no in-edges still get tele + the dangling share. */
  def bruteDirected(edges: Seq[(String, String)], iters: Int,
                    scale: Long): Map[String, Long] = {
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size
    val tele = (15L * (scale / n)) / 100L
    var r = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val dShare = nodes.filterNot(deg.contains).map(r).sum / n
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(v =>
        v -> (tele + (85L * (contrib.getOrElse(v, 0L) + dShare)) / 100L)).toMap
    }
    r
  }

  test("pageRankDirected: dangling sinks redistribute, sources survive, matches the brute model") {
    import spark.implicits._
    // directed with BOTH failure shapes: c and e are SINKS (no out-edges —
    // dangling mass), d is a pure SOURCE (no in-edges — must survive every
    // aggregate); a->b->c chain plus d feeding a and b feeding e
    val directed = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("b", "e"), ("d", "a"), ("d", "b"))
    val out = GraphOps.pageRankDirected(directed.toDF("src", "dst"), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val model = bruteDirected(directed, 5, 1000000000000L)
    assert(out == model, s"engine=$out\nmodel=$model")
    // semantics: the source d holds only tele + dangling share; c (fed by
    // two nodes) outranks it; total mass conserved within truncation loss
    assert(out("c") > out("d"))
    val mass = out.values.sum
    assert(mass <= 1000000000000L && mass > 999000000000L, mass)
  }

  test("pageRankDirected on a symmetric edge list equals pageRankFp bit-for-bit") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val gen = GraphOps.pageRankDirected(sym, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val fp = GraphOps.pageRankFp(sym, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gen == fp && gen.nonEmpty)
  }

  /** Driver-side mirror of personalizedPageRankFp's recurrence: teleport
    * (and the initial mass) only on the seed set. */
  def brutePersonalized(edges: Seq[(String, String)], seeds: Set[String],
                        iters: Int, scale: Long): Map[String, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val r0 = scale / seeds.size
    val tele = (15L * r0) / 100L
    var r = deg.keys.map(v => v -> (if (seeds(v)) r0 else 0L)).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = r.keys.map(v => v -> ((if (seeds(v)) tele else 0L)
        + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRankFp matches the brute model; unreached components stay 0") {
    import spark.implicits._
    // two components: {a,b,c} triangle + pendant d, and a DISCONNECTED pair
    // {x,y}; seeding {a} must leave x and y at exactly 0 forever
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "y"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.personalizedPageRankFp(
        sym, Seq("a").toDF("ent"), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val model = brutePersonalized(und ++ und.map(_.swap), Set("a"), 5, 1000000000000L)
    assert(out == model, s"engine=$out\nmodel=$model")
    assert(out("x") == 0L && out("y") == 0L)
    // proximity semantics: the seed's direct neighbors outrank the pendant
    // d, which is two hops out
    assert(out("a") > out("b") && out("b") > out("d"))
  }

  test("personalizedPageRankFp with seeds = all nodes equals pageRankFp bit-for-bit") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val allNodes = sym.select(col("src").as("ent")).distinct()
    val ppr = GraphOps.personalizedPageRankFp(sym, allNodes, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val fp = GraphOps.pageRankFp(sym, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ppr == fp && ppr.nonEmpty)
  }

  test("personalizedPageRankFp is bit-identical across parallelism and repartitioning") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("b", "d").toDF("ent")
    val a = GraphOps.personalizedPageRankFp(sym.repartition(13), seeds, 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = GraphOps.personalizedPageRankFp(sym.coalesce(1), seeds.coalesce(1), 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  /** Brute model for rangeJoin: every (left, right) pair with the same key
    * and l.ts + lower <= r.ts <= l.ts + upper (ms, bounds inclusive). */
  private def bruteRange(lower: Long, upper: Long): Set[(Long, Long, Long)] =
    (for {
      (lk, lt, lid) <- leftRows
      (rk, rt, rid, _) <- rightRows
      if rk == lk && rt >= lt + lower && rt <= lt + upper
    } yield (lid, lk, rid)).toSet

  test("rangeJoin matches the brute inequality model on symmetric and asymmetric windows") {
    for ((lo, hi) <- Seq((-3000L, 0L), (-1000L, 2000L), (1L, 4000L))) {
      val out = Timeseries.rangeJoin(
          leftDf, rightDf, "user_id", "ts", lo, hi, Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("r_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == bruteRange(lo, hi), s"window [$lo, $hi]")
    }
  }

  test("rangeJoin fails LOUD on internal/output column-name collisions") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts(10000L))).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, ts(9000L), 90L)).toDF("user_id", "ts", "event_id")
    // a left column shadowing an internal name would be silently
    // overwritten by withColumn; a left column named like a renamed right
    // payload would corrupt the output projection — both must error
    intercept[IllegalArgumentException] {
      Timeseries.rangeJoin(l.withColumn("_lus", lit(0L)), r,
        "user_id", "ts", -3000L, 0L, Seq("event_id"))
    }
    intercept[IllegalArgumentException] {
      Timeseries.rangeJoin(l.withColumn("_b", lit(0L)), r,
        "user_id", "ts", -3000L, 0L, Seq("event_id"))
    }
    intercept[IllegalArgumentException] {
      Timeseries.rangeJoin(l.withColumn("r_event_id", lit(0L)), r,
        "user_id", "ts", -3000L, 0L, Seq("event_id"))
    }
    intercept[IllegalArgumentException] {
      Timeseries.rangeJoin(l, r.withColumn("_rus", lit(0L)),
        "user_id", "ts", -3000L, 0L, Seq("event_id"))
    }
    // clean inputs still pass through the guards
    assert(Timeseries.rangeJoin(l, r, "user_id", "ts", -3000L, 0L,
      Seq("event_id")).count() == 1L)
  }

  test("rangeJoin bounds are inclusive and exact at microsecond precision") {
    import spark.implicits._
    // right rows planted exactly ON and 1ms OUTSIDE both bounds of a
    // [-3000, 0] window anchored at l.ts = 10000
    val l = Seq((1L, 1L, ts(10000L))).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (1L, ts(6999L), 90L), // 1ms before the lower bound -> excluded
      (1L, ts(7000L), 91L), // exactly at l.ts - 3000 -> included
      (1L, ts(10000L), 92L), // exactly at l.ts -> included
      (1L, ts(10001L), 93L)) // 1ms after the upper bound -> excluded
      .toDF("user_id", "ts", "event_id")
    val got = Timeseries.rangeJoin(l, r, "user_id", "ts", -3000L, 0L, Seq("event_id"))
      .select("r_event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(91L, 92L))
  }

  test("rangeJoin plans as an equi-join on (key, bucket) — no nested loop, no cartesian") {
    val out = Timeseries.rangeJoin(
      leftDf, rightDf, "user_id", "ts", -3000L, 0L, Seq("event_id", "value"))
    out.collect() // force execution so the final plan (incl. AQE) exists
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("rangeJoin is deterministic under hostile repartitioning") {
    val a = Timeseries.rangeJoin(
        leftDf.repartition(13), rightDf.coalesce(1), "user_id", "ts",
        -3000L, 0L, Seq("event_id", "value"))
      .collect().map(_.toString).sorted.toSeq
    val b = Timeseries.rangeJoin(
        leftDf.coalesce(1), rightDf.repartition(7), "user_id", "ts",
        -3000L, 0L, Seq("event_id", "value"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kCore: cascading peel reaches the unique fixpoint") {
    import spark.implicits._
    // triangle a-b-c with a pendant chain c-d-e: e falls (deg 1), which
    // drops d under k=2 NEXT round (the cascade needs the simultaneous
    // semantics — a single-pass filter would keep d); the triangle is the
    // 2-core
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core2 = GraphOps.kCore(sym, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core2 == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), core2)
    // k=3: triangle degrees are 2 -> everything peels away
    assert(GraphOps.kCore(sym, 3).count() == 0L)
    // determinism under hostile repartitioning (the fixpoint is unique)
    val rep = GraphOps.kCore(sym.repartition(13), 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == core2)
  }

  test("pageRankWeightedFp: uniform weights equal pageRankFp bit-for-bit; weights shift rank") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val w1 = sym.withColumn("w", lit(1L))
    val plain = GraphOps.pageRankFp(sym, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val uniform = GraphOps.pageRankWeightedFp(w1, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(uniform == plain) // (r*w) div (w*deg) == r div deg at constant w
    // a heavy a-b edge pulls rank toward b relative to the uniform run
    val heavy = sym.withColumn("w",
      when(col("src").isin("a", "b") && col("dst").isin("a", "b"), lit(50L))
        .otherwise(lit(1L)))
    val skewed = GraphOps.pageRankWeightedFp(heavy, 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(skewed("b") > uniform("b"), s"$skewed vs $uniform")
    assert(skewed("d") < uniform("d"))
    // determinism under hostile repartitioning
    val rep = GraphOps.pageRankWeightedFp(heavy.repartition(13), 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rep == skewed)
  }

  test("pageRankDirected is bit-identical across parallelism and repartitioning") {
    import spark.implicits._
    val directed = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("b", "e"), ("d", "a"), ("d", "b"),
      ("f", "a"), ("c", "f"))
    val df = directed.toDF("src", "dst")
    val a = GraphOps.pageRankDirected(df.repartition(13), 7).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val b = GraphOps.pageRankDirected(df.coalesce(1), 7).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("negativeSamples: deterministic filtered corruptions from the entity pool") {
    import spark.implicits._
    val triples = Seq(
      ("t1", "mentions", "a"), ("t1", "mentions", "b"),
      ("t2", "mentions", "a"), ("t2", "mentions", "c"),
      ("t1", "alias", "zz")).toDF("subj", "pred", "obj")
    val out = GraphOps.negativeSamples(triples, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    val pos = Set(("t1", "a"), ("t1", "b"), ("t2", "a"), ("t2", "c"))
    assert(out.nonEmpty)
    out.foreach { case (s, o, j, neg) =>
      assert(Set("a", "b", "c")(neg), s"corruption outside the pool: $neg")
      assert(neg != o, "self-corruption must be filtered")
      assert(!pos((s, neg)), "existing positives must be filtered (filtered setting)")
      assert(j == 1L || j == 2L)
    }
    // non-mention predicates contribute neither positives nor pool entries
    assert(!out.exists(t => t._4 == "zz" || t._2 == "zz"))
    // deterministic under hostile repartitioning
    val out2 = GraphOps.negativeSamples(triples.repartition(7), 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(out.sorted == out2.sorted)
  }

  test("negativeSamples fails LOUD on a non-dictionary-sized entity pool") {
    import spark.implicits._
    // the dense index is a global unpartitioned window — correct only for
    // a broadcast-sized pool; a general positives frame with an unbounded
    // tail domain must error, not silently serialize into one sort task
    val triples = (1 to 40)
      .map(i => (s"t$i", "mentions", s"e$i")).toDF("subj", "pred", "obj")
    val e = intercept[IllegalArgumentException] {
      GraphOps.negativeSamples(triples, 1, maxPool = 10L)
    }
    assert(e.getMessage.contains("maxPool"))
    // the same pool passes when the cap admits it, and stays bit-identical
    // to the default-cap draw (the guard must not change the contract)
    val a = GraphOps.negativeSamples(triples, 1, maxPool = 100L).collect()
      .map(r => (r.getString(0), r.getString(3))).toSeq.sorted
    val b = GraphOps.negativeSamples(triples, 1).collect()
      .map(r => (r.getString(0), r.getString(3))).toSeq.sorted
    assert(a == b && a.nonEmpty)
  }

  test("bfsDistances labels each node once with its minimum hop count") {
    import spark.implicits._
    // chain a-b-c-d-e plus a shortcut a-x-d (d is 3 hops via the chain but
    // 2 via x — min must win), plus an isolated pair y-z (unreachable)
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "x"), ("x", "d"), ("y", "z"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("ent")
    val got = GraphOps.bfsDistances(sym, seeds, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "x" -> 1L, "c" -> 2L,
      "d" -> 2L, "e" -> 3L), got)
    // depth cap: at maxDepth=1 only the immediate neighborhood is labeled
    val d1 = GraphOps.bfsDistances(sym, seeds, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d1 == Map("a" -> 0L, "b" -> 1L, "x" -> 1L), d1)
    // multiple seeds: the closer seed decides the level
    val got2 = GraphOps.bfsDistances(sym, Seq("a", "e").toDF("ent"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2("d") == 1L && got2("c") == 2L && got2("e") == 0L, got2)
    // early exit past the diameter: a huge cap costs nothing and the
    // unreachable component stays absent
    val full = GraphOps.bfsDistances(sym, seeds, 100).collect()
      .map(r => r.getString(0)).toSet
    assert(full == Set("a", "b", "c", "d", "e", "x"), full)
  }

  test("bfsDistances is deterministic under hostile repartitioning") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "x"), ("x", "d"))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a", "d").toDF("ent")
    val a = GraphOps.bfsDistances(sym.repartition(13), seeds.repartition(5), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = GraphOps.bfsDistances(sym.coalesce(1), seeds.coalesce(1), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("neighborSimilarity maxDegree cap drops hub neighbors from the sets") {
    import spark.implicits._
    // h is a hub neighbor of a,b,c,d, plus one a-b edge. Capped at
    // maxDegree=3, h (as a NEIGHBOR, df 4) leaves every set — h's own set
    // keeps its low-df members: N(a)={b}, N(b)={a}, N(c)=N(d)={},
    // N(h)={a,b,c,d}. Surviving overlaps: (a,h) share b, (b,h) share a,
    // each 1/(1+4) = 0.25; the pure-hub pairs like (c,d) (jaccard 1.0
    // uncapped) are GONE — exactly the k² blowup the cap exists to cut
    val und = Seq(("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"), ("a", "b"))
      .toDF("a", "b")
    val capped = GraphOps.neighborSimilarity(und, 0.1, maxDegree = Some(3L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(capped == Map(("a", "h") -> 0.25, ("b", "h") -> 0.25), capped)
    val uncapped = GraphOps.neighborSimilarity(und, 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // c,d: N={h} identical => jaccard 1.0 — present uncapped, culled capped
    assert(uncapped.contains(("c", "d")) && uncapped(("c", "d")) == 1.0, uncapped)
  }
}
