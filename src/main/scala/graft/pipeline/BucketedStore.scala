package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — the co-located-join storage pattern of SURVEY §4:
  * at 100 TB, the two sides of a RECURRING equi-join are both written
  * `bucketBy(key)` into the same bucket count, so Catalyst plans a
  * SortMergeJoin that reads matching buckets directly — ZERO exchanges on
  * either side at query time; the shuffle is paid once at write time and
  * amortized over every subsequent join. (Iceberg's `bucket(N, key)`
  * partition transform is the table-format spelling of the same layout;
  * Spark catalog bucketing is the in-sandbox vehicle — no Iceberg jar in
  * /opt/spark/jars.)
  *
  * Plan-gated in PlanSpec: the bucketed spelling of the 1-hop join must
  * show a SortMergeJoin with no Exchange on either input.
  */
object BucketedStore {

  /** Write `df` as an EXTERNAL bucketed table (data at `path`, metadata in
    * the session catalog under `table`), bucketed and sorted by `key`.
    * The pre-write `repartition(buckets, key)` uses the same murmur hash as
    * the bucketing spec, so each write task holds exactly one bucket and
    * emits ONE file per bucket — with a single sorted file per bucket the
    * reader needs neither exchange NOR per-bucket merge sort. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
