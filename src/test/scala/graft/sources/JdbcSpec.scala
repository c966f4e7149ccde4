package graft.sources

import graft.SparkSpec
import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** JDBC connector (reference `flink-jdbc/.../JDBCTableSource.java:46`,
  * `JDBCOutputFormat.java:40`, lookup `JDBCLookupFunction`) exercised
  * against embedded Derby — the one JDBC engine available in this
  * offline environment (/opt/spark/jars). Covers sink write, source
  * read, filter pushdown into the remote query, and the lookup join
  * running a REAL prepared-statement client (not a test stub).
  *
  * Column names are uppercase because Derby uppercases unquoted
  * identifiers in hand-written SQL while Spark quotes the ones it
  * generates. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def writeDim(): Unit = {
    val spark2 = spark; import spark2.implicits._
    Seq((1L, "AUTO", 10.5), (2L, "BIKE", 20.25), (3L, "ROAD", 0.0))
      .toDF("K", "SEG", "BAL")
      .write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "DIM_SEG").mode("overwrite").save()
  }

  private def readDim() = spark.read.format("jdbc")
    .option("url", url).option("driver", driver)
    .option("dbtable", "DIM_SEG").load()

  test("jdbc sink + source round-trip") {
    writeDim()
    val got = readDim().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "AUTO", 10.5), (2L, "BIKE", 20.25), (3L, "ROAD", 0.0)))
  }

  test("jdbc source pushes filters into the remote query") {
    writeDim()
    val q = readDim().filter(col("K") > 1).select(col("SEG"))
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed to JDBC source:\n$plan")
    assert(q.collect().map(_.getString(0)).toSet == Set("BIKE", "ROAD"))
  }

  test("lookupJoin enriches in place through a real JDBC client") {
    writeDim()
    val spark2 = spark; import spark2.implicits._
    val base = Seq((1L, 100.0), (2L, 200.0), (9L, 900.0)).toDF("K", "V")
    val u = url // local copy: don't capture the (non-serializable) suite
    val out = StreamJoins.lookupJoin[String](base, "K",
      () => { // one connection + prepared statement per partition
        val conn = java.sql.DriverManager.getConnection(u)
        val ps = conn.prepareStatement("SELECT SEG FROM DIM_SEG WHERE K = ?")
        (key: Long) => {
          ps.setLong(1, key)
          val rs = ps.executeQuery()
          val v = if (rs.next()) Some(rs.getString(1)) else None
          rs.close(); v
        }
      }, "SEG_LOOKED")
    val got = out.select(col("K"), col("SEG_LOOKED")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("AUTO")), (2L, Some("BIKE")), (9L, None)))
  }
}
