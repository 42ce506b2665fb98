package graft.app
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
/** Diagnostic: cost split of the dedup family on the sf0.1 corpus. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](n:String)(f: =>T):T={val t0=System.nanoTime();val r=f;println(f"[t] $n%-22s ${(System.nanoTime()-t0)/1e9}%6.2fs");r}
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sets = Dedup.shingleSets(docs, 3, 50L).persist()
    t("sets.count")(sets.count())
    t("minhashLsh cold")(Dedup.minhashLsh(sets, 0.6).count())
    t("jaccardPairs cold")(Dedup.jaccardPairs(sets, 0.6).count())
    t("minhashLsh warm")(Dedup.minhashLsh(sets, 0.6).count())
    t("jaccardPairs warm")(Dedup.jaccardPairs(sets, 0.6).count())
    spark.stop()
  }
}
