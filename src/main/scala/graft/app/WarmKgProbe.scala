package graft.app

import org.apache.spark.sql.SparkSession

/** Measurement-only reproduction of the driver bench's first half: cold kg
  * build, the full 95-query sweep (one count each), clearSession, warm kg
  * build — with heap/storage stats printed around the warm run, to
  * attribute a slow post-sweep warm number to residue vs code.
  */
object WarmKgProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mem(tag: String): Unit = {
      val rt = Runtime.getRuntime
      val used = (rt.totalMemory() - rt.freeMemory()) / 1e6
      val blocks = spark.sparkContext.getRDDStorageInfo
      val cachedMb = blocks.map(_.memSize).sum / 1e6
      println(f"[mem] $tag%-18s heapUsed=${used}%.0fMB storageRdds=${blocks.length} storageMem=${cachedMb}%.0fMB")
    }
    def timedKg(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.kg(spark, sfDir).triples.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[warmprobe] kg_cold ${timedKg()}%.2f")
    mem("after cold")
    val skipSweep = sys.env.contains("SPARK_GRAFT_NO_SWEEP")
    if (!skipSweep) {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"[warmprobe] $name FAILED ${e.getMessage}") }
      }
      mem("after sweep")
    }
    graft.SparkEntry.clearSession(spark)
    mem("after clear")
    if (sys.env.contains("SPARK_GRAFT_PROBE_GC")) { System.gc(); mem("after gc") }
    println(f"[warmprobe] kg_warm ${timedKg()}%.2f")
    mem("after warm")
    spark.stop()
  }
}
