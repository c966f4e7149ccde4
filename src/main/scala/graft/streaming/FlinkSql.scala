package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE unified Flink-SQL entry point — one `executeSql` for every
  * statement a reference user's `TableEnvironment.executeSql` accepts
  * in this engine's surface, routing each to its front-end:
  *
  *  - DDL / DML (`CREATE TABLE/VIEW`, `INSERT`, `DROP`, SELECT) →
  *    [[FlinkDdl.Env]], with every SELECT body piped through the
  *    composable TEXT rewriters first: group windows
  *    ([[GroupWindowSql.rewrite]]: TUMBLE/HOP/SESSION + auxiliaries),
  *    UDTF correlates ([[FlinkSqlJoins.rewriteLateral]]) and the
  *    scalar-function dialect ([[FlinkFunctions.rewrite]]:
  *    SPLIT_INDEX, FROM/TO_BASE64, SIMILAR TO, FLOOR/CEIL-to-unit,
  *    TRUNCATE, IS_* predicates, SHA-2 family, CONVERT_TZ) — all
  *    identity on text that uses no dialect, so plain SQL flows
  *    through untouched;
  *  - `… FOR SYSTEM_TIME AS OF …` → [[FlinkSqlJoins.runTemporal]]
  *    (the AsOfJoin plan node);
  *  - `SELECT * FROM t MATCH_RECOGNIZE (…)` → [[MatchRecognize.run]]
  *    over the table read as the Event surface.
  *
  * Reference analog: `TableEnvironmentImpl.executeSql` dispatching on
  * the parsed operation kind (`flink-table/flink-table-api-java/…/
  * internal/TableEnvironmentImpl.java`).
  */
object FlinkSql {

  private val dialects: String => String =
    (GroupWindowSql.rewrite _) compose (FlinkSqlJoins.rewriteLateral _) compose
      (FlinkFunctions.rewrite _)

  private val MatchStmtRe =
    """(?is)^\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*$""".r
  private val TemporalHintRe = """(?i)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b""".r
  // CREATE VIEW whose body needs the ROUTER (MATCH_RECOGNIZE /
  // temporal) — evaluated here and registered, instead of handing
  // plain spark.sql an unparseable body
  private val RoutedViewRe =
    """(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+AS\s+(SELECT\b.*)$""".r
  private val ExplainRe =
    """(?is)^\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?(.+)$""".r

  final class Env(spark: SparkSession) {
    private val ddl = new FlinkDdl.Env(spark, dialects)

    /** Route one statement; SELECT-like statements return a frame. */
    def executeSql(stmt: String): Option[DataFrame] = stmt match {
      // the reference's explain surface (1.10 `TableEnvironment
      // .explain(Table)`, the `EXPLAIN PLAN FOR` statement form):
      // route the inner statement through THIS dispatcher — so
      // MATCH_RECOGNIZE / temporal / dialect-rewritten bodies explain
      // too — and return the parsed→analyzed→optimized→physical plan
      // text as one row (Flink prints AST / optimized / physical).
      case ExplainRe(inner) =>
        import spark.implicits._
        def planOf(df: DataFrame) = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
        // INSERT explains WITHOUT executing (the reference's
        // explainSql(INSERT) surface): the aligned write-side frame's
        // plan, headed by the sink binding
        ddl.insertFrame(inner) match {
          case Some((sink, frame)) =>
            Some(Seq(s"== Sink: DDL table $sink ==\n" + planOf(frame))
              .toDF("plan"))
          case None =>
            // gate BEFORE routing: any other DDL statement routed
            // through the dispatcher would EXECUTE its side effect
            // under EXPLAIN
            if (!"""(?is)^\s*\(?\s*SELECT\b.*""".r.matches(inner))
              throw new IllegalArgumentException(
                "EXPLAIN requires a SELECT or INSERT statement")
            val df = executeSql(inner).getOrElse(
              throw new IllegalArgumentException(
                "EXPLAIN requires a SELECT or INSERT statement"))
            Some(Seq(planOf(df)).toDF("plan"))
        }
      case MatchStmtRe(tableName, clause) =>
        import spark.implicits._
        Some(MatchRecognize.run(spark.table(tableName).as[Event], clause))
      case s if TemporalHintRe.findFirstIn(s).isDefined &&
          !s.trim.toUpperCase.startsWith("CREATE") =>
        Some(FlinkSqlJoins.runTemporal(spark, s))
      case RoutedViewRe(name, body)
          if MatchStmtRe.matches(body) ||
            TemporalHintRe.findFirstIn(body).isDefined =>
        executeSql(body).foreach(_.createOrReplaceTempView(name)); None
      case s => ddl.executeSql(s)
    }

    /** Execute a whole script; returns the LAST statement's frame. */
    def executeScript(script: String): DataFrame =
      FlinkDdl.splitStatements(script).flatMap(executeSql) match {
        case rs if rs.nonEmpty => rs.last
        case _ => throw new IllegalArgumentException(
          "FlinkSql: script contained no result-producing statement")
      }

    /** Streaming read of a DDL-declared table (watermark applied). */
    def readStream(name: String, options: Map[String, String] = Map.empty)
        : DataFrame = ddl.readStream(name, options)
  }
}
