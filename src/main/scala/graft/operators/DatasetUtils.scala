package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The reference's DataSet utility surface (`flink-java/.../utils/
  * DataSetUtils.java`): zipWithIndex (:89), zipWithUniqueId (:149),
  * sampleWithSize (:232), checksumHashCode (:347).
  *
  * Scale notes: zipWithIndex is the reference's own two-pass design —
  * Spark's `RDD.zipWithIndex` runs an identical count-per-partition
  * pass then offsets locally, so no data ever concentrates; applied
  * after a global sort the index is the dense 0-based rank.
  * zipWithUniqueId is one-pass (taskId-interleaved ids, unique but
  * not contiguous — Flink bit-shifts the same way). sampleWithSize
  * materializes only the n-row sample on the driver (bounded by n,
  * not by data size). checksumHashCode is an order-independent
  * commutative sum — one partial-agg pass, one long out.
  */
object DatasetUtils {

  private def prepend(df: DataFrame, name: String,
      rdd: org.apache.spark.rdd.RDD[(Row, Long)]): DataFrame =
    df.sparkSession.createDataFrame(
      rdd.map { case (row, id) => Row.fromSeq(id +: row.toSeq) },
      StructType(StructField(name, LongType, nullable = false) +: df.schema.fields))

  /** Contiguous 0-based global index in the frame's current order —
    * sort first to make the index a rank. */
  def zipWithIndex(df: DataFrame): DataFrame =
    prepend(df, "idx", df.rdd.zipWithIndex())

  /** Unique (not contiguous) ids, one pass, no second job. */
  def zipWithUniqueId(df: DataFrame): DataFrame =
    prepend(df, "uid", df.rdd.zipWithUniqueId())

  /** Exact-size random sample without replacement (reference
    * sampleWithSize: distributed reservoir). Deterministic per seed. */
  def sampleWithSize(df: DataFrame, n: Int, seed: Long): DataFrame =
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(
        df.rdd.takeSample(withReplacement = false, n, seed).toSeq),
      df.schema)

  /** Exact running prefix sum of a long column in the frame's current
    * order, WITHOUT a single-partition window: the zipWithIndex
    * two-pass design applied to sums — pass 1 collects one partial
    * sum per partition (numPartitions longs, metadata-sized), pass 2
    * adds the broadcast offsets to a local running sum. Prepends
    * `prefix` = sum of values STRICTLY BEFORE the row. Sort first (or
    * repartitionByRange + sortWithinPartitions) to make the order
    * deterministic — both passes re-evaluate the same lineage, so the
    * order must be stable. */
  def prefixSum(df: DataFrame, valueCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    val rdd = df.rdd
    require(rdd.getNumPartitions <= 65536,
      s"prefixSum: ${rdd.getNumPartitions} partitions — the per-partition " +
        "sums pass would stop being metadata-sized; coalesce first")
    val partSums = rdd.mapPartitionsWithIndex { (p, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(idx)); Iterator((p, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      var run = offsets(p)
      it.map { r =>
        val v = r.getLong(idx); val pre = run; run += v
        Row.fromSeq(pre +: r.toSeq)
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(StructField("prefix", LongType, nullable = false)
        +: df.schema.fields))
  }

  /** Order-independent checksum: count + sum of Java hashCodes of the
    * given string column (the reference's Utils.ChecksumHashCode). */
  def checksumHashCode(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.agg(count(lit(1)).as("n"),
      sum(graft.functions.GraftFunctions.hash_code(col(colName))
        .cast("long")).as("checksum"))
  }
}
