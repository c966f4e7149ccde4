package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all specs: one local session per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder(cores = 4, appName = "graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
