package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-21: the fast [[AuditRowJson.Enc]] serializer must emit
  * BYTE-IDENTICAL lines to the original per-row chain (kept here as the
  * reference implementation), and parseLine must round-trip them, on
  * randomized rows covering every supported type, nulls, escapes,
  * control chars and unicode. */
class AuditRowJsonSpec extends AnyFunSuite {

  // the pre-round-21 implementation, verbatim — the reference
  private def refLine(schema: StructType, record: GenericInternalRow): String = {
    def esc(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '"'  => sb.append("\\\"")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v = f.dataType match {
        case _ if record.isNullAt(i) => "null"
        case LongType | IntegerType  => record.get(i, f.dataType).toString
        case DoubleType              => record.getDouble(i).toString
        case BooleanType             => record.getBoolean(i).toString
        case StringType => "\"" + esc(record.getUTF8String(i).toString) + "\""
        case TimestampType | TimestampNTZType => record.getLong(i).toString
        case other => throw new UnsupportedOperationException(s"$other")
      }
      "\"" + f.name + "\":" + v
    }
    fields.mkString("{", ",", "}")
  }

  private val schema = StructType(Seq(
    StructField("l1", LongType), StructField("i1", IntegerType),
    StructField("d1", DoubleType), StructField("b1", BooleanType),
    StructField("s1", StringType), StructField("ts", TimestampType),
    StructField("tn", TimestampNTZType), StructField("s2", StringType)))

  private def randRow(rnd: scala.util.Random): GenericInternalRow = {
    def maybeNull[A <: AnyRef](v: A): AnyRef =
      if (rnd.nextInt(8) == 0) null else v
    def randStr(): String = {
      val n = rnd.nextInt(24)
      val chars = Seq.fill(n)(rnd.nextInt(6) match {
        case 0 => rnd.nextPrintableChar()
        case 1 => Seq('\\', '"', '\n', '\r', '\t')(rnd.nextInt(5))
        case 2 => rnd.nextInt(0x20).toChar // control
        case 3 => (0x100 + rnd.nextInt(0x2000)).toChar // unicode BMP
        case _ => ('a' + rnd.nextInt(26)).toChar
      })
      chars.mkString
    }
    new GenericInternalRow(Array[Any](
      maybeNull(java.lang.Long.valueOf(rnd.nextLong())),
      maybeNull(java.lang.Integer.valueOf(rnd.nextInt())),
      maybeNull(java.lang.Double.valueOf(
        if (rnd.nextBoolean()) rnd.nextDouble() * 1e6 else -rnd.nextDouble())),
      maybeNull(java.lang.Boolean.valueOf(rnd.nextBoolean())),
      maybeNull(UTF8String.fromString(randStr())),
      maybeNull(java.lang.Long.valueOf(rnd.nextLong() % 1800000000000000L)),
      maybeNull(java.lang.Long.valueOf(rnd.nextLong() % 1800000000000000L)),
      maybeNull(UTF8String.fromString(randStr()))))
  }

  test("Enc emits byte-identical lines to the reference chain") {
    val rnd = new scala.util.Random(42)
    val enc = new AuditRowJson.Enc(schema)
    val sw = new java.io.StringWriter()
    (1 to 2000).foreach { _ =>
      val row = randRow(rnd)
      val expected = refLine(schema, row)
      assert(enc.line(row) == expected)
      assert(AuditRowJson.line(schema, row) == expected)
      sw.getBuffer.setLength(0)
      enc.writeTo(row, sw)
      assert(sw.toString == expected + "\n")
    }
  }

  test("parseLine round-trips Enc lines (values and nulls)") {
    val rnd = new scala.util.Random(7)
    val enc = new AuditRowJson.Enc(schema)
    (1 to 2000).foreach { _ =>
      val row = randRow(rnd)
      val back = AuditJson.parseLine(enc.line(row), schema)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (row.isNullAt(i)) assert(back.isNullAt(i), f.name)
        else f.dataType match {
          case StringType =>
            assert(back.getUTF8String(i) == row.getUTF8String(i), f.name)
          case DoubleType =>
            assert(back.getDouble(i) == row.getDouble(i), f.name)
          case IntegerType => assert(back.getInt(i) == row.getInt(i), f.name)
          case BooleanType =>
            assert(back.getBoolean(i) == row.getBoolean(i), f.name)
          case _ => assert(back.getLong(i) == row.getLong(i), f.name)
        }
      }
    }
  }

  test("empty schema still frames as {}") {
    val enc = new AuditRowJson.Enc(StructType(Nil))
    assert(enc.line(new GenericInternalRow(Array.empty[Any])) == "{}")
  }
}
