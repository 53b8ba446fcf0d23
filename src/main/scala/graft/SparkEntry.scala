package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator module contributes a Seq[Q]; each Q pairs the Spark
  * plan with the DuckDB oracle SQL the driver replays at sf0.01.
  */
object SparkEntry {

  /** The full registered catalog. */
  def all: Seq[Q] =
    WordCount.queries ++ Relational.queries ++ Windows.queries ++
      Events.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Temporal.queries ++
      Udaf.queries ++ Connectors.queries ++ Bucketing.queries ++
      Pipeline.queries ++ ScalarFns.queries ++ TrainingFilters.queries ++
      graft.streaming.Streams.queries

  /** Flagship query; driver smoke-checks rows>0. The data dir is
    * overridable (env SPARK_GRAFT_SF_DIR) rather than hardcoded. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    WordCount.wordCount(Tables(spark, dir, "documents"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Subset benchmarked at sf0.1 (excludes quadratic oracle-parity demos). */
  def benchQueries: Seq[Q] = all.filter(_.headline)
}
