package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed through a batched `mapPartitions` pipeline — the
  * Scala-native equivalent of the PySpark `mapInPandas` batch-UDF shape.
  *
  * The decode step is a STUB by design: image/audio codecs aren't in this
  * environment, so `decodeBatch` computes deterministic fake features
  * (byte stats, aspect-preserving thumbnail dims, frame counts) in place of
  * a real codec call. Everything AROUND the stub is the real engineering:
  * the typed schema, the binary column, the batch iterator shape, and the
  * partition-preserving execution — swap `decodeBatch`'s body for a codec
  * and nothing else changes.
  *
  * Scale: map-only over whatever partitioning the scan provides; payloads
  * never shuffle. Batch size bounds per-batch memory exactly like Arrow
  * batch sizing does for pandas UDFs.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
      format: String, width: Int, height: Int)

  /** Decoded (stub) features. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      content_hash: String, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int, n_frames: Int, mean_byte: Double)

  val BatchSize = 64
  val ThumbBox = 64.0
  val FrameBytes = 100

  /** Synthesize the media table from documents: the text bytes stand in for
    * an encoded payload; metadata derives deterministically from n_chars.
    * (With real data this is just `spark.read` over a table with a binary
    * column — the rest of the pipeline is unchanged.) */
  def mediaTable(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    documents(spark, d).select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake/raw").as("format"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        ((col("n_chars") * 7) % 480 + 16).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** The batch "decode" — deterministic stand-in for a codec library call.
    * One call per batch (not per row), mirroring how a real decoder would
    * amortize setup cost across an Arrow batch. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
    val md = MessageDigest.getInstance("MD5") // per-batch, like codec setup
    batch.map { r =>
      md.reset()
      val hash = md.digest(r.payload).map("%02x".format(_)).mkString
      val scale = math.min(1.0, math.min(ThumbBox / r.width, ThumbBox / r.height))
      val sum = r.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = r.payload.length.toLong,
        content_hash = hash,
        width = r.width,
        height = r.height,
        thumb_w = math.max(1, math.floor(r.width * scale).toInt),
        thumb_h = math.max(1, math.floor(r.height * scale).toInt),
        n_frames = math.ceil(r.payload.length / FrameBytes.toDouble).toInt,
        // empty payload: 0.0, not NaN — keeps the feature column total and
        // mirrors the oracle's CASE (DuckDB's list_sum over an empty range
        // would yield NULL, silently diverging)
        mean_byte = if (r.payload.isEmpty) 0.0
                    else sum.toDouble / r.payload.length)
    }
  }

  /** Feature extraction: partition-preserving batched map. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  def features(spark: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(spark, d)).toDF()

  /** Oracle: every stub feature is arithmetic over text/n_chars, so DuckDB
    * reproduces the whole mapPartitions path (ASCII corpus ⇒ byte values =
    * code points). */
  val featuresSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  md5(text) AS content_hash,
       |  CAST(n_chars % 640 + 16 AS INT) AS width,
       |  CAST((n_chars * 7) % 480 + 16 AS INT) AS height,
       |  CAST(greatest(1, floor((n_chars % 640 + 16) *
       |    least(1.0, $ThumbBox/(n_chars % 640 + 16), $ThumbBox/((n_chars*7) % 480 + 16)))) AS INT) AS thumb_w,
       |  CAST(greatest(1, floor(((n_chars*7) % 480 + 16) *
       |    least(1.0, $ThumbBox/(n_chars % 640 + 16), $ThumbBox/((n_chars*7) % 480 + 16)))) AS INT) AS thumb_h,
       |  CAST(ceil(length(text) / ${FrameBytes.toDouble}) AS INT) AS n_frames,
       |  CASE WHEN length(text) = 0 THEN 0.0
       |       ELSE list_sum(list_transform(generate_series(1, length(text)),
       |         i -> ascii(substring(text, i, 1)))) / CAST(length(text) AS DOUBLE)
       |  END AS mean_byte
       |FROM documents""".stripMargin

  val FrameStep = 5

  /** Frame sampling — the video-shaped access pattern: every `FrameStep`-th
    * fixed-size frame of each payload becomes a row with a per-frame
    * feature (stub: md5 of the frame's bytes; a codec would decode here).
    * The plumbing is the operator: a BOUNDED generator (n_frames/step rows
    * per doc, never data-dependent blowup), dynamic-offset slicing, and a
    * map-only plan — payloads never shuffle, frames project at scan speed. */
  def frameSample(spark: SparkSession, d: String): DataFrame =
    documents(spark, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ceil(length(col("text")) / lit(FrameBytes.toDouble)).cast("int") - 1,
          lit(FrameStep))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(encode(col("text").substr(col("frame_idx") * FrameBytes + 1,
          lit(FrameBytes)), "UTF-8")).as("frame_hash"),
        length(col("text").substr(col("frame_idx") * FrameBytes + 1,
          lit(FrameBytes))).cast("long").as("frame_bytes"))

  val frameSampleSql: String =
    s"""SELECT doc_id, f AS frame_idx,
       |       md5(substring(text, CAST(f*$FrameBytes+1 AS INT), $FrameBytes)) AS frame_hash,
       |       length(substring(text, CAST(f*$FrameBytes+1 AS INT), $FrameBytes)) AS frame_bytes
       |FROM (SELECT doc_id, text,
       |        unnest(generate_series(0,
       |          CAST(ceil(length(text)/${FrameBytes.toDouble}) AS BIGINT) - 1,
       |          $FrameStep)) AS f
       |      FROM documents WHERE length(text) > 0)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s, d) => features(s, d)),
    "q_frame_sample"        -> ((s, d) => frameSample(s, d)))

  def oracles: Map[String, String] = Map(
    "q_multimodal_features" -> featuresSql,
    "q_frame_sample"        -> frameSampleSql)
}
