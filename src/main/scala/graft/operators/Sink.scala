package graft.operators

import org.apache.spark.sql.DataFrame

/** Output layer (SURVEY.md §1.6: the reference's NetCDF writer becomes
  * columnar, partition-prunable files).
  *
  * Layout rules the writers encode:
  *  - partition columns = the predicates downstream queries prune on
  *    (the reference's per-profile files become per-class/mission dirs)
  *  - sortWithinPartitions on range-filtered columns → parquet/ORC
  *    min-max row-group stats actually cut IO
  *  - bucketing co-locates a join key so repeated joins skip the shuffle
  */
object Sink {

  def writePartitioned(df: DataFrame, path: String, format: String,
                       partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(df(_)): _*) else df
    sorted.write.mode("overwrite").format(format)
      .partitionBy(partitionCols: _*).save(path)
  }

  /** Bucketed managed table: `nBuckets` hash buckets on `bucketCol`,
    * sorted inside each bucket — joins and aggregations on the bucket
    * key read co-located data with no exchange.
    */
  def writeBucketed(df: DataFrame, table: String, format: String,
                    bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format(format)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
