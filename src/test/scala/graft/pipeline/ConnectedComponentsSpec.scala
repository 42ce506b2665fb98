package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** driverPath=false forces the distributed label-propagation loop;
    * true exercises the size-adaptive driver union-find fast path. */
  def cc(vs: Seq[String], es: Seq[(String, String)], driverPath: Boolean = true): Map[String, String] = {
    import spark.implicits._
    val vdf = vs.toDF("id")
    val edf = es.toDF("src", "dst")
    val out =
      if (driverPath) ConnectedComponents.run(vdf, edf)
      else ConnectedComponents.runDistributed(vdf, edf)
    out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("driver fast path and distributed loop agree") {
    val rnd = new scala.util.Random(9)
    val vs = (0 until 80).map(i => f"x$i%03d")
    val es = (0 until 70).map(_ => (vs(rnd.nextInt(vs.size)), vs(rnd.nextInt(vs.size))))
    assert(cc(vs, es, driverPath = true) == cc(vs, es, driverPath = false))
  }

  test("chain collapses to min label (worst-case diameter)") {
    val n = 12
    val vs = (0 until n).map(i => f"v$i%02d")
    val es = (0 until n - 1).map(i => (f"v$i%02d", f"v${i + 1}%02d"))
    val m = cc(vs, es)
    assert(m.values.toSet == Set("v00"))
  }

  test("disjoint components keep separate minima; singletons self-label") {
    val m = cc(Seq("a", "b", "c", "d", "z"), Seq(("b", "a"), ("d", "c")))
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "c", "z" -> "z"))
  }

  test("matches the union-find oracle on a random graph") {
    val rnd = new scala.util.Random(5)
    val vs = (0 until 60).map(i => f"n$i%03d")
    val es = (0 until 50).map(_ => (vs(rnd.nextInt(vs.size)), vs(rnd.nextInt(vs.size))))
    val got = cc(vs, es)
    val want = graft.oracle.Oracle.connectedComponents(vs, es)
    assert(got == want)
  }
}
