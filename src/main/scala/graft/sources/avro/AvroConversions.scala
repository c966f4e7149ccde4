package graft.sources.avro

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.Schema.{Type => AvroType}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Spark ⇄ Avro schema and value conversions for the graft-avro
  * connector (SURVEY §2.7 avro row).
  *
  * Matches the reference's Avro⇄Row type mapping
  * (`flink-formats/flink-avro/.../AvroRowSerializationSchema.java:76`,
  * `AvroRowDeserializationSchema.java:80`, logical types per
  * `typeutils/AvroSchemaConverter.java`): primitives 1:1, temporal
  * types via Avro logical types (`date` on int, `timestamp-micros` /
  * `local-timestamp-micros` on long — µs precision, lossless for the
  * engine's TIMESTAMP columns), decimals as unscaled big-endian bytes
  * with the `decimal` logical type, nullability as `union(null, T)`,
  * arrays element-converted. Spark-side values use the InternalRow
  * vocabulary (UTF8String / micros longs / Decimal) so the scan feeds
  * codegen without a per-row Row allocation.
  */
object AvroConversions {

  // ---- schema: Spark -> Avro ----

  def toAvroSchema(st: StructType, recordName: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvroField(f.dataType, f.nullable), null.asInstanceOf[String])
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  private def toAvroField(dt: DataType, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType                   => Schema.create(AvroType.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(AvroType.INT)
      case LongType                      => Schema.create(AvroType.LONG)
      case FloatType                     => Schema.create(AvroType.FLOAT)
      case DoubleType                    => Schema.create(AvroType.DOUBLE)
      case StringType                    => Schema.create(AvroType.STRING)
      case BinaryType                    => Schema.create(AvroType.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(AvroType.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(AvroType.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(AvroType.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(AvroType.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroField(et, containsNull))
      case other =>
        throw new IllegalArgumentException(s"graft-avro: unsupported Spark type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(AvroType.NULL), base) else base
  }

  // ---- schema: Avro -> Spark ----

  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == AvroType.RECORD,
      s"graft-avro: top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkField(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def toSparkField(s: Schema): (DataType, Boolean) = s.getType match {
    case AvroType.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != AvroType.NULL)
      require(nonNull.size == 1,
        s"graft-avro: only union(null, T) unions are supported, got $s")
      val (dt, _) = toSparkField(nonNull.head)
      (dt, branches.size > nonNull.size)
    case AvroType.BOOLEAN => (BooleanType, false)
    case AvroType.INT =>
      if (isLogical(s, "date")) (DateType, false) else (IntegerType, false)
    case AvroType.LONG =>
      if (isLogical(s, "timestamp-micros") || isLogical(s, "timestamp-millis"))
        (TimestampType, false)
      else if (isLogical(s, "local-timestamp-micros") ||
               isLogical(s, "local-timestamp-millis"))
        (TimestampNTZType, false)
      else (LongType, false)
    case AvroType.FLOAT  => (FloatType, false)
    case AvroType.DOUBLE => (DoubleType, false)
    case AvroType.STRING => (StringType, false)
    case AvroType.BYTES | AvroType.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _                       => (BinaryType, false)
      }
    case AvroType.ARRAY =>
      val (et, en) = toSparkField(s.getElementType)
      (ArrayType(et, en), false)
    case other =>
      throw new IllegalArgumentException(s"graft-avro: unsupported Avro type $other")
  }

  private def isLogical(s: Schema, name: String): Boolean = {
    val lt: LogicalType = s.getLogicalType
    lt != null && lt.getName == name
  }

  // ---- values: Avro GenericRecord -> InternalRow (required columns only) ----

  /** Per-field decoder closures resolved once per file, not per row.
    *
    * Schema evolution (the reference's Avro default-value read path,
    * `AvroRowDeserializationSchema`): a requested column absent from
    * an older file's schema reads as null when the Spark field is
    * nullable — so a widened table schema reads old and new container
    * files side by side; a non-nullable absent column fails loudly. */
  def recordDecoder(fileSchema: Schema, required: StructType): GenericRecord => InternalRow = {
    val decoders = required.fields.map { f =>
      val avroField = fileSchema.getField(f.name)
      if (avroField == null) {
        require(f.nullable,
          s"graft-avro: non-nullable column ${f.name} absent from file schema $fileSchema")
        (_: GenericRecord) => null
      } else {
        val pos = avroField.pos()
        val dec = valueDecoder(nonNullBranch(avroField.schema()), f.dataType)
        (rec: GenericRecord) => {
          val v = rec.get(pos)
          if (v == null) null else dec(v)
        }
      }
    }
    rec => InternalRow.fromSeq(decoders.map(_(rec)).toIndexedSeq)
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == AvroType.UNION)
      s.getTypes.asScala.find(_.getType != AvroType.NULL).get
    else s

  private def valueDecoder(s: Schema, dt: DataType): Any => Any = dt match {
    case StringType  => v => UTF8String.fromString(v.toString)
    case BinaryType  => v => copyBytes(v)
    case TimestampType if isLogical(s, "timestamp-millis") => v => v.asInstanceOf[Long] * 1000L
    case TimestampNTZType if isLogical(s, "local-timestamp-millis") =>
      v => v.asInstanceOf[Long] * 1000L
    case TimestampType | TimestampNTZType | LongType => v => v.asInstanceOf[Long]
    case IntegerType | DateType => v => v.asInstanceOf[Int]
    case BooleanType => v => v.asInstanceOf[Boolean]
    case FloatType   => v => v.asInstanceOf[Float]
    case DoubleType  => v => v.asInstanceOf[Double]
    case d: DecimalType => v =>
      Decimal(BigDecimal(BigInt(copyBytes(v)), d.scale), d.precision, d.scale)
    case ArrayType(et, _) =>
      val elemDec = valueDecoder(nonNullBranch(s.getElementType), et)
      v => {
        val it = v.asInstanceOf[java.util.Collection[AnyRef]].iterator()
        val out = new Array[Any](v.asInstanceOf[java.util.Collection[AnyRef]].size())
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          out(i) = if (e == null) null else elemDec(e)
          i += 1
        }
        new GenericArrayData(out)
      }
    case other =>
      throw new IllegalArgumentException(s"graft-avro: unsupported read type $other")
  }

  private def copyBytes(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case fixed: org.apache.avro.generic.GenericFixed => fixed.bytes().clone()
    case arr: Array[Byte] => arr
  }

  // ---- values: InternalRow -> Avro GenericRecord ----

  def rowEncoder(schema: StructType, avro: Schema): InternalRow => GenericRecord = {
    val encoders = schema.fields.zipWithIndex.map { case (f, i) =>
      val enc = valueEncoder(f.dataType, nonNullBranch(avro.getFields.get(i).schema()))
      (row: InternalRow) => if (row.isNullAt(i)) null else enc(row.get(i, f.dataType))
    }
    row => {
      val rec = new GenericData.Record(avro)
      var i = 0
      while (i < encoders.length) { rec.put(i, encoders(i)(row)); i += 1 }
      rec
    }
  }

  private def valueEncoder(dt: DataType, avro: Schema): Any => AnyRef = dt match {
    case StringType => v => v.asInstanceOf[UTF8String].toString
    case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case TimestampType | TimestampNTZType | LongType =>
      v => java.lang.Long.valueOf(v.asInstanceOf[Long])
    case IntegerType | DateType => v => java.lang.Integer.valueOf(v.asInstanceOf[Int])
    case BooleanType => v => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
    case FloatType   => v => java.lang.Float.valueOf(v.asInstanceOf[Float])
    case DoubleType  => v => java.lang.Double.valueOf(v.asInstanceOf[Double])
    case _: DecimalType =>
      v => ByteBuffer.wrap(v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
    case ArrayType(et, _) =>
      val elemEnc = valueEncoder(et, nonNullBranch(avro.getElementType))
      v => {
        val ad = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](ad.numElements())
        var i = 0
        while (i < ad.numElements()) {
          out.add(if (ad.isNullAt(i)) null else elemEnc(ad.get(i, et)))
          i += 1
        }
        out
      }
    case other =>
      throw new IllegalArgumentException(s"graft-avro: unsupported write type $other")
  }
}
