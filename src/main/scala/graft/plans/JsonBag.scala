package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `json_bag(linenumber, partkey, suppkey)` — a custom
  * `TypedImperativeAggregate` producing EXACTLY
  * `to_json(sort_array(collect_list(struct(...))))`: the reference's
  * "bag re-nesting" (A1, spark_jobs/playback_pipeline.py:177-184) as one
  * imperative aggregation.
  *
  * Why a custom aggregate: the compositional form buffers an
  * UnsafeArrayData of structs in `collect_list`, copies it through
  * `sort_array` (interpreted array sort), then walks it again in
  * `StructsToJson` — three materializations of every group's bag. This
  * aggregate keeps one mutable buffer, sorts once at eval, and serializes
  * straight into the output string. Same ObjectHashAggregate physics
  * (partial buffers merge map-side), ~one-third the per-group allocation.
  *
  * Sort order matches `sort_array` on `struct(long, string, string)`:
  * field-by-field, strings in binary (UTF-8 byte) order — the key strings
  * here are ASCII digits, where Java's compareTo agrees byte-for-byte.
  *
  * This is the engine's `TypedImperativeAggregate` extension-surface
  * exemplar (SURVEY §2.11 names it the north-star custom-UDAF path);
  * bit-parity with the compositional spec is guarded by JsonBagSpec.
  */
case class JsonBagAgg(
    lineNumber: Expression, partKey: Expression, suppKey: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[JsonBag.Item]] {

  override def children: Seq[Expression] = Seq(lineNumber, partKey, suppKey)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "json_bag"

  override def createAggregationBuffer(): mutable.ArrayBuffer[JsonBag.Item] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[JsonBag.Item],
      input: InternalRow): mutable.ArrayBuffer[JsonBag.Item] = {
    // materialize strings: the incoming UTF8Strings may point into a
    // reused row buffer. Number.longValue: accepts any integral input type
    // (l_linenumber is int32; digits render identically in JSON)
    buf += JsonBag.Item(
      lineNumber.eval(input).asInstanceOf[Number].longValue(),
      partKey.eval(input).asInstanceOf[UTF8String].toString,
      suppKey.eval(input).asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[JsonBag.Item],
      other: mutable.ArrayBuffer[JsonBag.Item]): mutable.ArrayBuffer[JsonBag.Item] = {
    buf ++= other; buf
  }

  override def eval(buf: mutable.ArrayBuffer[JsonBag.Item]): Any =
    UTF8String.fromString(JsonBag.render(buf))

  override def serialize(buf: mutable.ArrayBuffer[JsonBag.Item]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { it =>
      out.writeLong(it.ln); out.writeUTF(it.pk); out.writeUTF(it.sk)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[JsonBag.Item] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[JsonBag.Item](n)
    var i = 0
    while (i < n) {
      buf += JsonBag.Item(in.readLong(), in.readUTF(), in.readUTF()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): JsonBagAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): JsonBagAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsonBagAgg =
    copy(lineNumber = newChildren(0), partKey = newChildren(1),
      suppKey = newChildren(2))
}

object JsonBag {

  final case class Item(ln: Long, pk: String, sk: String)

  /** Binary (UTF-8 byte) string order — what sort_array uses for
    * StringType fields. Equals String.compareTo on ASCII content. */
  private def byteCompare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val ordering: Ordering[Item] = (a: Item, b: Item) => {
    if (a.ln != b.ln) java.lang.Long.compare(a.ln, b.ln)
    else {
      val c = byteCompare(a.pk, b.pk)
      if (c != 0) c else byteCompare(a.sk, b.sk)
    }
  }

  private def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04X") // Jackson: uppercase hex
        case x => sb.append(x)
      }
      i += 1
    }
  }

  /** Render exactly like `to_json` over the sorted struct array:
    * `[{"linenumber":1,"partkey":"19","suppkey":"7"},…]`, no spaces. */
  def render(buf: mutable.ArrayBuffer[Item]): String = {
    val sorted = buf.sorted(ordering)
    val sb = new java.lang.StringBuilder(buf.length * 48 + 2)
    sb.append('[')
    var first = true
    sorted.foreach { it =>
      if (!first) sb.append(',')
      first = false
      sb.append("{\"linenumber\":").append(it.ln)
      sb.append(",\"partkey\":\""); esc(sb, it.pk)
      sb.append("\",\"suppkey\":\""); esc(sb, it.sk)
      sb.append("\"}")
    }
    sb.append(']').toString
  }

  /** Register as a SQL-callable temp function:
    * `expr("json_bag(ln, pk, sk)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_bag",
      exprs => JsonBagAgg(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "scala_udf")
}
