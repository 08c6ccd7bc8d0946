package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping token-window chunking as a custom GENERATOR (UDTF surface —
  * the one Catalyst extension kind the engine had not yet exercised;
  * reference's only UDTF-shaped op is built-in explode, SURVEY §2.11).
  *
  * Contract identical to the compositional
  * [[graft.operators.TextAnalysis.chunkDocs]]: token starts 1, 1+stride, …
  * ≤ max(n − stride, 1); trailing windows run short, a short/empty doc
  * yields exactly one chunk, null text yields none. Coverage
  * precondition: every token lands in a chunk iff `width >= 2*stride`
  * (the usual overlapping-chunk regime); with a narrower width the bound
  * stops before the tail and the last tokens are deliberately NOT
  * re-covered — the same truncation the compositional operator performs,
  * so the two surfaces stay interchangeable for any width/stride.
  * The composition pays one `split` per OUTPUT CHUNK (the exploded
  * row re-tokenizes the carried text for slice/size); this generator
  * tokenizes each document ONCE and emits all its chunks — O(doc) instead
  * of O(doc · chunks) per document, at scan speed inside GenerateExec.
  *
  * Registered as SQL function `chunk_tokens(text, width, stride[, delim])`
  * via [[GraftExtensions]] (LATERAL VIEW-able), and used directly from the
  * DataFrame API through the shim-wrapped Column.
  *
  * `delim` generalizes the chunk UNIT: the default `" "` windows over
  * whitespace tokens; passing a sentence sentinel (text pre-split with
  * `regexp_replace(text, '([.!?]) +', '$1' + U+0001)`) windows over WHOLE
  * SENTENCES — the retrieval-chunking variant that never cuts
  * mid-sentence ([[graft.operators.TextAnalysis.sentenceChunks]]).
  */
case class ChunkTokensGen(child: Expression, width: Int, stride: Int,
    delim: String = " ")
  extends Generator with CodegenFallback {

  require(width > 0 && stride > 0, s"width/stride must be positive: $width/$stride")
  require(delim.length == 1, s"delim must be a single character, got '$delim'")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkTokensGen =
    copy(child = newChildren(0))

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_pos", LongType, nullable = false),
    StructField("chunk_len", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      // split(delim, -1) keeps trailing empties — same as Spark's split()
      // and DuckDB's string_split, so "" tokenizes to [""] like the
      // composition
      val tokens = t.toString.split(java.util.regex.Pattern.quote(delim), -1)
      val n = tokens.length
      val last = math.max(n - stride, 1)
      new Iterator[InternalRow] {
        private var start = 1
        override def hasNext: Boolean = start <= last
        override def next(): InternalRow = {
          val end = math.min(start - 1 + width, n)
          val row = InternalRow(
            ((start - 1) / stride).toLong,
            start.toLong,
            (end - start + 1).toLong,
            UTF8String.fromString(
              tokens.slice(start - 1, end).mkString(delim)))
          start += stride
          row
        }
      }
    }
  }
}
