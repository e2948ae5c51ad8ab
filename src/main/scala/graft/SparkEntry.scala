package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-block registries in
  * `graft.queries.*`; every entry with a DuckDB-expressible oracle also
  * appears in `oracleSql` (same key, same output column names — the
  * driver's compare hashes columns sorted by name).
  */
object SparkEntry {

  /** All registered operators, blocks A–D (SURVEY.md §2). */
  def registry: Seq[(String, Q)] = Blocks.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head._2.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}

/** Single assembly point so adding a block is one line. */
object Blocks {
  def all: Seq[(String, Q)] =
    graft.queries.Relational.entries ++
      graft.queries.ReferenceOps.entries ++
      graft.queries.TrainingData.entries ++
      graft.queries.TimeSeriesQueries.entries
}
