package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.TextSim

/** The native Catalyst expressions must agree bit-for-bit with the shared
  * TextSim core on every input (interpreted eval AND generated code paths),
  * and resolve as SQL functions after registration. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("SQL surface: known rapidfuzz-pinned values") {
    val r = spark.sql(
      "SELECT graft_token_sort_ratio('new york mets', 'mets new york') AS f, " +
        "graft_lev_ratio('kitten', 'sitting') AS l").head()
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - (1.0 - 3.0 / 7.0)) < 1e-15)
  }

  test("null-intolerant: null input yields null, not an error") {
    val r = spark.sql("SELECT graft_token_sort_ratio('a', CAST(NULL AS STRING))").head()
    assert(r.isNullAt(0))
  }

  test("expressions agree with the shared TextSim core on random inputs (codegen path)") {
    import spark.implicits._
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.listOf(word).map(_.mkString(" "))
    val pairs = Gen.listOfN(60, Gen.zip(text, text)).sample.get
    val df = pairs.toDF("a", "b").repartition(3)
    df.createOrReplaceTempView("pairs_tbl")
    val got = spark.sql(
      "SELECT a, b, graft_token_sort_ratio(a, b) AS tsr, graft_lev_ratio(a, b) AS lr FROM pairs_tbl")
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getDouble(2) == TextSim.tokenSortRatio(a, b), s"tsr('$a','$b')")
      assert(r.getDouble(3) == TextSim.levRatio(a, b), s"lr('$a','$b')")
    }
  }

  test("graft_dot: bit-identical to the aggregate/zip_with left fold; null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq.fill(17)(rnd.nextDouble() * 2 - 1), Seq.fill(17)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b").repartition(3)
    val fold = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val got = df.select(col("id"), graft.operators.Similarity.dot(col("a"), col("b")).as("d"),
      fold.as("f")).collect()
    got.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getLong(0)}"))
    // SQL registration + null array => null
    df.createOrReplaceTempView("dot_tbl")
    val viaSql = spark.sql(
      "SELECT id, graft_dot(a, b) AS d, graft_dot(a, CAST(NULL AS ARRAY<DOUBLE>)) AS n FROM dot_tbl")
      .collect()
    viaSql.foreach { r =>
      val exp = got.find(_.getLong(0) == r.getLong(0)).get.getDouble(1)
      assert(r.getDouble(1) == exp)
      assert(r.isNullAt(2))
    }
    // the SQL builder coerces array<float> (the engine's native embedding
    // type) like the built-in higher-order spelling would
    val f = spark.sql(
      "SELECT graft_dot(CAST(ARRAY(1.5, 2.5) AS ARRAY<FLOAT>), CAST(ARRAY(2.0, 4.0) AS ARRAY<FLOAT>))")
      .head().getDouble(0)
    assert(f == 13.0)
  }

  test("usable inside ordinary Column pipelines via expr()") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val out = Seq(("alpha beta", "beta alpha"), ("abc", "abd")).toDF("a", "b")
      .withColumn("s", expr("graft_token_sort_ratio(a, b)"))
      .orderBy("a").collect().map(_.getDouble(2))
    assert(out(0) == TextSim.tokenSortRatio("abc", "abd"))
    assert(out(1) == 1.0)
  }
}
