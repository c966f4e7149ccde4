package graft.streaming

import org.apache.spark.sql.types._
import graft.SparkSpec

/** DDL front-end contract: type lattice, quote-aware script
  * splitting, positional INSERT semantics, the WATERMARK→stream
  * wiring, and the loud rejections (q225–q227 bind the end-to-end
  * pipelines against the oracle). */
class FlinkDdlSpec extends SparkSpec {

  test("type lattice maps the Flink DDL names") {
    assert(FlinkDdl.sqlType("BIGINT") === LongType)
    assert(FlinkDdl.sqlType("varchar(255)") === StringType)
    assert(FlinkDdl.sqlType("STRING") === StringType)
    assert(FlinkDdl.sqlType("TIMESTAMP(3)") === TimestampType)
    assert(FlinkDdl.sqlType("DECIMAL(10, 2)") === DecimalType(10, 2))
    assert(FlinkDdl.sqlType("BOOLEAN") === BooleanType)
    val e = intercept[IllegalArgumentException](FlinkDdl.sqlType("GEOMETRY"))
    assert(e.getMessage.contains("unsupported column type"))
  }

  test("script splitting ignores semicolons inside string literals") {
    val stmts = FlinkDdl.splitStatements(
      "CREATE TABLE t (a BIGINT) WITH ('path' = '/x;y');  SELECT 1 ;")
    assert(stmts.size == 2)
    assert(stmts.head.contains("/x;y"))
  }

  test("non-filesystem connectors are rejected with the env reason") {
    val env = new FlinkDdl.Env(spark)
    val e = intercept[IllegalArgumentException](env.executeSql(
      "CREATE TABLE k (a BIGINT) WITH ('connector' = 'kafka', 'topic' = 'x')"))
    assert(e.getMessage.contains("external services"))
  }

  test("PROCTIME computed columns are rejected") {
    val env = new FlinkDdl.Env(spark)
    val e = intercept[IllegalArgumentException](env.executeSql(
      """CREATE TABLE t (a BIGINT, p AS PROCTIME())
        |WITH ('connector' = 'filesystem', 'path' = '/tmp/x')""".stripMargin))
    assert(e.getMessage.contains("nondeterministic"))
  }

  test("INSERT aligns positionally and casts to declared types") {
    val base = java.nio.file.Files.createTempDirectory("graft-ddlspec")
    val env = new FlinkDdl.Env(spark)
    env.executeSql(
      s"""CREATE TABLE snk (big BIGINT, name STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/snk',
         |      'format' = 'parquet')""".stripMargin)
    // source columns are named differently and typed INT — position +
    // cast must carry them into (BIGINT, STRING)
    env.executeSql("INSERT INTO snk SELECT 7 AS x, 'a' AS y")
    val got = env.executeSql("SELECT big, name FROM snk").get.collect()
    assert(got.length == 1 && got(0).getLong(0) == 7L && got(0).getString(1) == "a")
  }

  test("column-count mismatch on INSERT fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-ddlspec2")
    val env = new FlinkDdl.Env(spark)
    env.executeSql(
      s"""CREATE TABLE snk2 (a BIGINT, b STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/snk',
         |      'format' = 'parquet')""".stripMargin)
    val e = intercept[IllegalArgumentException](
      env.executeSql("INSERT INTO snk2 SELECT 1"))
    assert(e.getMessage.contains("columns for"))
  }

  test("WATERMARK clause becomes withWatermark on the stream read") {
    val base = java.nio.file.Files.createTempDirectory("graft-ddlspec3")
    import spark.implicits._
    Seq((1L, 1000000L)).toDF("a", "ts_us").write
      .option("header", "false").csv(s"$base/src")
    val env = new FlinkDdl.Env(spark)
    env.executeSql(
      s"""CREATE TABLE ws (a BIGINT, ts_us BIGINT,
         |  ts AS timestamp_micros(ts_us),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE)
         |WITH ('connector.type' = 'filesystem',
         |      'connector.path' = '$base/src', 'format.type' = 'csv')""".stripMargin)
    val stream = env.readStream("ws")
    assert(stream.isStreaming)
    assert(stream.queryExecution.logical.toString.contains("EventTimeWatermark"),
      s"watermark missing from plan:\n${stream.queryExecution.logical}")
  }

  test("SHOW TABLES and DESCRIBE expose the DDL catalog") {
    val base = java.nio.file.Files.createTempDirectory("graft-ddlshow")
    val env = new FlinkDdl.Env(spark)
    env.executeSql(
      s"""CREATE TABLE shown (a BIGINT, ts_us BIGINT,
         |  ts AS timestamp_micros(ts_us),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE)
         |WITH ('connector' = 'filesystem', 'path' = '$base/x',
         |      'format' = 'parquet')""".stripMargin)
    val names = env.executeSql("SHOW TABLES").get
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("shown"))
    val desc = env.executeSql("DESCRIBE shown").get
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(desc == Map("a" -> "physical", "ts_us" -> "physical",
      "ts" -> "watermark")) // ts appears as computed AND watermark; map keeps last
    val kinds = env.executeSql("DESC shown").get
      .collect().map(_.getString(2)).toSeq
    assert(kinds.count(_ == "computed") == 1 && kinds.count(_ == "watermark") == 1)
  }

  test("unknown statements are rejected, DROP TABLE forgets the table") {
    val env = new FlinkDdl.Env(spark)
    val e = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE t RENAME TO u"))
    assert(e.getMessage.contains("unsupported statement"))
    val base = java.nio.file.Files.createTempDirectory("graft-ddlspec4")
    env.executeSql(
      s"""CREATE TABLE gone (a BIGINT)
         |WITH ('connector' = 'filesystem', 'path' = '$base/x',
         |      'format' = 'parquet')""".stripMargin)
    env.executeSql("DROP TABLE gone")
    val e2 = intercept[IllegalArgumentException](
      env.executeSql("INSERT INTO gone SELECT 1"))
    assert(e2.getMessage.contains("unknown DDL table"))
  }

  test("avro DDL tables write+read through graft-avro; partition leg rejects") {
    val env = new FlinkDdl.Env(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-ddlspec5")
    env.executeSql(
      s"""CREATE TABLE av (a BIGINT, s STRING)
         |WITH ('connector' = 'filesystem', 'path' = '$base/av',
         |      'format' = 'avro')""".stripMargin)
    env.executeSql("INSERT INTO av SELECT 7, 'x'")
    assert(env.executeSql("SELECT a, s FROM av").get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "x")))
    // container files really are avro, via the raw connector
    assert(spark.read.format("graft-avro").load(s"$base/av")
      .count() == 1)
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      s"""CREATE TABLE avp (a BIGINT, p STRING) PARTITIONED BY (p)
         |WITH ('connector' = 'filesystem', 'path' = '$base/avp',
         |      'format' = 'avro')""".stripMargin))
    assert(e2.getMessage.contains("does not support"))
  }
}
