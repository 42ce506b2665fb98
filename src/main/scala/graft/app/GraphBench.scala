package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Scale evidence for the iterative graph layer (pageRankFp): a
  * deterministic synthetic scale-free-ish graph far larger than any
  * co-mention graph the sf fixtures produce, timed per iteration, plus the
  * operator's determinism claim checked the hard way — ranks at local[k]
  * must be BIT-EQUAL to ranks at local[1]-equivalent partitioning (fixed-
  * point arithmetic makes that exact, not approximate).
  *
  * Graph: `nEdges` undirected edges over `nNodes` nodes; endpoint draws
  * come from xxhash64 so the edge list is reproducible anywhere. The dst
  * draw is taken modulo a hash-derived prefix size, which skews attachment
  * toward low node ids — a long-tailed degree distribution (hub nodes),
  * the shape real entity graphs have and the shape that stresses the
  * contribution aggregate's hot keys.
  *
  * args: [cores] [nNodes] [nEdges] [iters]
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val nNodes = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nEdges = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val iters = args.lift(3).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(parts: Int): DataFrame = {
      // und(i) = (a_i, b_i): a uniform, b skewed to low ids by drawing
      // modulo a hash-chosen power-of-two window (deterministic hubs)
      val e = spark.range(0, nEdges, 1, parts)
        .withColumn("a", pmod(xxhash64(col("id"), lit(1)), lit(nNodes)))
        .withColumn("w", pow(lit(2.0), (pmod(xxhash64(col("id"), lit(2)), lit(20)) + 1).cast("double")).cast("long"))
        .withColumn("b", pmod(xxhash64(col("id"), lit(3)), least(lit(nNodes), col("w"))))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"))
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val e = edges(cores.toInt)
    val (nE, tBuild) = time(e.count())

    if (sys.env.contains("GRAFT_EXPLAIN")) {
      val p = GraphOps.pageRankFp(e, 1).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      System.err.println(p.take(6000))
    }

    val (ranks, tRank) = time {
      val r = GraphOps.pageRankFp(e, iters).persist()
      r.count(); r
    }
    val nNodesActual = ranks.count()
    val mass = ranks.agg(sum("rank_fp")).head.getLong(0)
    val perIter = tRank / iters
    val edgeJoinsPerSec = nE.toDouble * iters / tRank

    // determinism across partitioning: same graph at a hostile layout must
    // produce the SAME 64-bit rank for every node
    val (mismatches, tCheck) = time {
      val r2 = GraphOps.pageRankFp(e.repartition(7), iters)
      ranks.join(r2.withColumnRenamed("rank_fp", "r2"), "ent")
        .filter(col("rank_fp") =!= col("r2")).count()
    }

    println(f"""{"nodes":$nNodesActual,"edges":$nE,"iters":$iters,"build_sec":$tBuild%.2f,"rank_sec":$tRank%.2f,"sec_per_iter":$perIter%.2f,"edge_joins_per_sec":$edgeJoinsPerSec%.0f,"mass_fp":$mass,"bitexact_mismatches":$mismatches,"check_sec":$tCheck%.2f}""")
    spark.stop()
  }
}
