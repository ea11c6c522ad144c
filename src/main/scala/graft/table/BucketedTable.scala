package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shuffle-free co-located joins via Spark's native bucketed tables.
  *
  * [[SnapshotTable]] buckets its DATA LAYOUT by conv_id (pruned point
  * reads); this companion covers the JOIN side of the bucketing story: two
  * tables bucketed by the same key into the same bucket count are
  * partition-co-located, so an equi-join on that key needs NO Exchange on
  * either side — the single biggest shuffle eliminated at 100 TB scale,
  * where joining turns against per-conversation dimensions (labels, QA
  * verdicts, routing metadata) would otherwise reshuffle the full corpus
  * every run. BucketedJoinSpec asserts the zero-Exchange plan.
  *
  * Catalog-registered (`saveAsTable` with an explicit path → external
  * table): bucketing metadata lives in the catalog, which is what lets the
  * planner trust the layout. A plain `.parquet(path)` write cannot carry it.
  */
object BucketedTable {

  /** Write `df` as an external bucketed table registered as `name`.
    * Bucket count must match across tables meant to co-join. */
  def save(df: DataFrame, name: String, path: String, buckets: Int,
      key: String = "conv_id"): Unit =
    df.write
      .option("path", path)
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Equi-join two same-bucketed tables on their bucket key. With both
    * sides' bucketing visible to the planner the SortMergeJoin reads each
    * bucket pair directly — zero Exchange. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String = "conv_id"): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
