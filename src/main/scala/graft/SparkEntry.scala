package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.queries("q10_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.queries ++ JoinQueries.queries ++ WindowQueries.queries ++
    CalcQueries.queries ++ EventQueries.queries ++
    TextQueries.queries ++ VectorQueries.queries ++ ExtraQueries.queries ++
    PipelineQueries.queries ++ TpchQueries.queries ++ TpchQueries2.queries ++
    TpcdsShapes.queries ++ GraphQueries.queries ++
    StreamParityQueries.queries ++ StreamParityQueries2.queries ++
    StreamParityQueries3.queries ++
    UdxQueries.queries ++ FormatQueries.queries ++ Partitioning.queries ++
    SourceQueries.queries ++ CorpusQueries.queries ++
    StreamParityQueries4.queries ++ SqlFrontendQueries.queries ++
    CurationQueries.queries ++ StreamParityQueries5.queries ++
    IvfPqQueries.queries ++ FluentApiQueries.queries ++
    SketchQueries.queries ++ LayoutQueries.queries ++
    CapstoneQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AggQueries.oracle ++ JoinQueries.oracle ++ WindowQueries.oracle ++
    CalcQueries.oracle ++ EventQueries.oracle ++
    TextQueries.oracle ++ VectorQueries.oracle ++ ExtraQueries.oracle ++
    PipelineQueries.oracle ++ TpchQueries.oracle ++ TpchQueries2.oracle ++
    TpcdsShapes.oracle ++ GraphQueries.oracle ++
    StreamParityQueries.oracle ++ StreamParityQueries2.oracle ++
    StreamParityQueries3.oracle ++
    UdxQueries.oracle ++ FormatQueries.oracle ++ Partitioning.oracle ++
    SourceQueries.oracle ++ CorpusQueries.oracle ++
    StreamParityQueries4.oracle ++ SqlFrontendQueries.oracle ++
    CurationQueries.oracle ++ StreamParityQueries5.oracle ++
    IvfPqQueries.oracle ++ FluentApiQueries.oracle ++
    SketchQueries.oracle ++ LayoutQueries.oracle ++
    CapstoneQueries.oracle
}
