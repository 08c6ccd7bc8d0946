package graft.sources

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the audit sink's writer-escape → reader-parse loop:
  * the parser only ever reads the sink's own output, so the invariant that
  * matters is exact round-tripping over the FULL value space the writer
  * can emit — including control characters, quotes, backslashes, unicode,
  * null fields, negative numbers, and special doubles. A mismatch here
  * would corrupt time travel, DELETE evaluation, and the streaming tail
  * alike, which is why it gets its own generator-driven suite. */
class AuditJsonPropSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("msg", StringType),
    StructField("score", DoubleType), StructField("flag", BooleanType)))

  /** Serialize one row exactly the way [[AuditDataWriter.write]] does —
    * kept in lockstep by the assertions below running against BOTH this
    * mirror and a real writer (file-level test in JsonAuditSinkSpec). */
  private def writeLine(id: java.lang.Long, msg: String,
      score: java.lang.Double, flag: java.lang.Boolean): String = {
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
    val f1 = if (id == null) "null" else id.toString
    val f2 = if (msg == null) "null" else "\"" + esc(msg) + "\""
    val f3 = if (score == null) "null" else score.toString
    val f4 = if (flag == null) "null" else flag.toString
    s"""{"id":$f1,"msg":$f2,"score":$f3,"flag":$f4}"""
  }

  private val genMsg: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf[String]("a", "\"", "\\", "\n", "\r", "\t",
      "\u0001", " ", "\u00e9", "\u4e2d", "\ud834\udd1e")).map(_.mkString),
    Gen.const(null: String))

  test("escape→parse round-trips every writable value exactly") {
    val rows = Gen.listOfN(500, for {
      id <- Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue).map(Long.box),
        Gen.const(null: java.lang.Long))
      msg <- genMsg
      score <- Gen.oneOf(
        Gen.chooseNum(-1e18, 1e18).map(Double.box),
        Gen.oneOf[java.lang.Double](0.0, -0.0, Double.MinPositiveValue,
          1.0 / 3.0, 1e-300, -1e300),
        Gen.const(null: java.lang.Double))
      flag <- Gen.oneOf[java.lang.Boolean](true, false, null)
    } yield (id, msg, score, flag)).sample.get

    rows.foreach { case (id, msg, score, flag) =>
      val row = AuditJson.parseLine(writeLine(id, msg, score, flag), schema)
      def at[T](i: Int, get: => T): Any = if (row.isNullAt(i)) null else get
      assert(at(0, row.getLong(0)) === (if (id == null) null else id.longValue))
      assert(at(1, row.getUTF8String(1).toString) === msg)
      assert(at(2, row.getDouble(2)) ===
        (if (score == null) null else score.doubleValue))
      assert(at(3, row.getBoolean(3)) ===
        (if (flag == null) null else flag.booleanValue))
    }
  }

  test("parser rejects out-of-order fields loudly; vintage gaps fill forward") {
    // a known field arriving BEHIND the cursor is corruption (the sink
    // writes in schema order) — loud
    intercept[IllegalArgumentException] {
      AuditJson.parseLine("""{"msg":"a","id":1,"score":1.0,"flag":true}""", schema)
    }
    // a known field arriving AHEAD of the cursor is a VINTAGE line that
    // predates the skipped columns (e.g. a base line's origin fields
    // after a post-compaction ADD COLUMN): the gap fills null (or the
    // existence default), and parsing continues at the jumped-to field
    val jumped = AuditJson.parseLine(
      """{"idx":1,"msg":"a","score":1.0,"flag":true}""", schema)
    assert(jumped.isNullAt(0)) // id absent from this vintage
    assert(jumped.getUTF8String(1).toString === "a")
    assert(jumped.getBoolean(3) === true)
  }
}
