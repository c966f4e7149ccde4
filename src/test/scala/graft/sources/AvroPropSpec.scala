package graft.sources

import graft.sources.avro.AvroConversions
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Property test for the graft-avro conversion layer: randomized rows
  * over the full supported type lattice (nulls everywhere, empty
  * strings/arrays/binaries, negative decimals, extreme timestamps) go
  * InternalRow → GenericRecord → REAL container bytes (DataFileWriter,
  * so framing/sync markers are in the loop) → decode → InternalRow,
  * and must arrive value-identical. Pure in-memory — no Spark jobs —
  * so hundreds of cases are cheap. */
class AvroPropSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(18, 4)),
    StructField("arr", ArrayType(LongType))))

  private def opt[T](g: Gen[T]): Gen[Any] =
    Gen.frequency(4 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  private val genRow: Gen[Seq[Any]] = for {
    i <- opt(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    l <- opt(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    f <- opt(Gen.chooseNum(-1e30f, 1e30f))
    d <- opt(Gen.chooseNum(-1e200, 1e200))
    b <- opt(Gen.oneOf(true, false))
    s <- opt(Gen.listOf(Gen.alphaNumChar).map(cs => UTF8String.fromString(cs.mkString)))
    bin <- opt(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    dt <- opt(Gen.chooseNum(-100000, 100000))
    ts <- opt(Gen.chooseNum(-62135596800000000L, 253402300799999999L))
    dec <- opt(Gen.chooseNum(-99999999999999L, 99999999999999L)
      .map(u => Decimal(BigDecimal(u, 4), 18, 4)))
    arr <- opt(Gen.listOf(opt(Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(xs => new GenericArrayData(xs.toArray)))
  } yield Seq(i, l, f, d, b, s, bin, dt, ts, dec, arr)

  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case a: GenericArrayData => a.array.map(norm).toSeq
    case other => other
  }

  test("rows survive the full container round trip value-identically") {
    val avro = AvroConversions.toAvroSchema(schema, "PropRow")
    val enc = AvroConversions.rowEncoder(schema, avro)
    val dec = AvroConversions.recordDecoder(avro, schema)

    val prop = Prop.forAll(Gen.listOfN(5, genRow)) { rowSeqs =>
      val rows = rowSeqs.map(vs => InternalRow.fromSeq(vs))
      val bos = new ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
      w.create(avro, bos)
      rows.foreach(r => w.append(enc(r)))
      w.close()
      val in = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(bos.toByteArray), new GenericDatumReader[GenericRecord]())
      val back = try {
        val buf = Vector.newBuilder[InternalRow]
        while (in.hasNext) buf += dec(in.next())
        buf.result()
      } finally in.close()
      val want = rowSeqs.map(_.map(norm))
      val got = back.map(r => schema.indices.map(i =>
        norm(r.get(i, schema(i).dataType))).toSeq)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("pruned decode reads any column subset of a full file") {
    val avro = AvroConversions.toAvroSchema(schema, "PropRow")
    val enc = AvroConversions.rowEncoder(schema, avro)
    val row = InternalRow.fromSeq(Seq(7, 8L, 1.5f, 2.5, true,
      UTF8String.fromString("x"), Array[Byte](1), 10, 1000000L,
      Decimal(BigDecimal(12345, 4), 18, 4),
      new GenericArrayData(Array[Any](1L, null, 3L))))
    val rec = enc(row)
    // every single-column projection decodes just that column
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val dec1 = AvroConversions.recordDecoder(avro, StructType(Seq(f)))
      val got = dec1(rec)
      assert(got.numFields == 1)
      assert(norm(got.get(0, f.dataType)) == norm(row.get(i, f.dataType)),
        s"column ${f.name}")
    }
    // reversed-order projection decodes by NAME, not position
    val rev = StructType(schema.fields.reverse)
    val decR = AvroConversions.recordDecoder(avro, rev)
    val got = decR(rec)
    rev.fields.zipWithIndex.foreach { case (f, i) =>
      val orig = schema.fieldIndex(f.name)
      assert(norm(got.get(i, f.dataType)) == norm(row.get(orig, f.dataType)),
        s"column ${f.name}")
    }
  }
}
