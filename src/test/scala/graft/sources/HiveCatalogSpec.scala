package graft.sources

import graft.SparkSpec
import scala.sys.process._

/** Drives HiveCatalogDemo in a subprocess: hive support must be
  * enabled at a JVM's first session, which the suite-shared session
  * already precludes here. */
class HiveCatalogSpec extends SparkSpec {
  test("hive catalog: managed + partitioned tables over an embedded metastore") {
    val out = new StringBuilder
    val code = Process(Seq("tools/run.sh", "graft.sources.HiveCatalogDemo"),
      new java.io.File("/root/repo"))
      .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0 && out.toString.contains("HIVE_OK"),
      s"hive demo failed (exit $code):\n$out")
  }
}
