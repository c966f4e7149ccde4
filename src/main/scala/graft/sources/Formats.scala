package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink format helpers (SURVEY §2.7).
  *
  * Reference: CSV `CsvTableSource.java:59` / `CsvRowDeserializationSchema
  * .java:57`, JSON `JsonRowDeserializationSchema.java:77`, ORC
  * `OrcTableSource.java:82` (vectorized + pushdown), parquet
  * `ParquetRowInputFormat.java:32`.
  *
  * Spark's built-in datasources cover all of these with vectorized
  * readers and pushdown; these helpers pin the options that match the
  * reference's semantics (header handling, timestamp formats) so a
  * reference user's table definitions port 1:1.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schemaDdl).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Avro via the in-house graft-avro DataSource V2 connector
    * (`graft.sources.avro.AvroDataSource` — reference
    * `flink-formats/flink-avro`). */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.format("graft-avro").mode("overwrite").save(path)

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-avro").load(path)
}
