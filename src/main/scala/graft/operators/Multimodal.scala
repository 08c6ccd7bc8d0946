package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed through a batched `mapPartitions` pipeline — the
  * Scala-native equivalent of the PySpark `mapInPandas` batch-UDF shape.
  *
  * The decode step is a REAL codec call: payloads are genuine PNG bytes
  * (encoded with `javax.imageio`, which ships in the JDK — no external
  * codec needed) and `decodeBatch` runs `ImageIO.read` per payload,
  * extracting true width/height and raster pixel statistics. The fixture
  * images are generated from deterministic per-doc formulas (dims and a
  * gray ramp from doc_id), so a DuckDB oracle can recompute every DECODED
  * feature from the generation parameters — if the encode→decode path
  * corrupted a single pixel, the hash compare would fail.
  *
  * Scale: map-only over whatever partitioning the scan provides; payloads
  * never shuffle. Batch size bounds per-batch memory exactly like Arrow
  * batch sizing does for pandas UDFs; the decoder is probed once per batch
  * (`ImageIO` caches readers), mirroring codec-setup amortization.
  */
object Multimodal {

  // r21 (guide §1/§4 — per-task work): ImageIO defaults to DISK-backed
  // stream caches, so every in-memory encode/decode round-tripped a temp
  // FILE (create+write+read+delete per image — FileCacheImageInput/
  // OutputStream). All payloads here are byte arrays; cache in memory.
  // JVM-global, affects performance only, never decoded values.
  ImageIO.setUseCache(false)

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
      format: String)

  /** Features DECODED from the payload (not copied from metadata). */
  final case class MediaFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, pixel_sum: Long, mean_px: Double,
      thumb_w: Long, thumb_h: Long)

  val BatchSize = 64
  val ThumbBox = 16.0
  val FrameBytes = 100

  // deterministic generation parameters — the oracle's ground truth
  def imgWidth(docId: Long): Int = (docId % 24 + 8).toInt
  def imgHeight(docId: Long): Int = ((docId * 7) % 24 + 8).toInt
  def pixelValue(docId: Long, x: Int, y: Int): Int =
    ((3L * x + 7L * y + docId) % 256L).toInt

  /** Encode one REAL PNG (8-bit grayscale, lossless round trip). */
  def encodePng(docId: Long): Array[Byte] = {
    val w = imgWidth(docId)
    val h = imgHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixelValue(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize the media table: one real PNG per document row, encoded on
    * the EXECUTORS (the payload column is born distributed — with real
    * data this is just `spark.read` over a table with a binary column;
    * the rest of the pipeline is unchanged). */
  def mediaTable(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // Decode/encode parallelism is bound by INPUT SPLITS, not rows: a
    // small single-file corpus plans one partition and runs the whole
    // per-image codec pass single-threaded (measured at sf1: the decode
    // dominated q_img_dedup 80:1 before this repartition — SCALING.md
    // round-10). Payloads here are a narrow id column, so the reshuffle
    // is cheap; with real binary payloads the same rule says repartition
    // BEFORE the expensive per-row codec, not after.
    documents(spark, d).select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => MediaRecord(id, encodePng(id), "image/png"))
  }

  /** The batch decode — a REAL `ImageIO.read` per payload. Width/height
    * and every pixel statistic come from the decoded raster, never from
    * row metadata: the codec is on the hot path and under test. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
    batch.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable payload for doc ${r.doc_id}")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val scale = math.min(1.0, math.min(ThumbBox / w, ThumbBox / h))
      MediaFeatures(
        doc_id = r.doc_id,
        width = w.toLong,
        height = h.toLong,
        n_pixels = w.toLong * h,
        pixel_sum = sum,
        // two exact integers, one correctly-rounded division — bit-equal
        // to the oracle's CAST(sum AS DOUBLE)/(w*h)
        mean_px = sum.toDouble / (w.toLong * h),
        thumb_w = math.max(1L, math.floor(w * scale).toLong),
        thumb_h = math.max(1L, math.floor(h * scale).toLong))
    }
  }

  /** Feature extraction: partition-preserving batched map. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  def features(spark: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(spark, d)).toDF()

  /** Oracle: recompute every DECODED feature from the deterministic
    * generation parameters — dims from the doc_id formulas, the pixel sum
    * by materializing the same (3x+7y+doc_id) mod 256 gray ramp over a
    * w×h position grid. The Spark side only matches if the PNG
    * encode→decode round trip reproduced the raster exactly. */
  val featuresSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |         CAST(doc_id % 24 + 8 AS BIGINT) AS w,
       |         CAST((doc_id * 7) % 24 + 8 AS BIGINT) AS h
       |  FROM documents
       |), px AS (
       |  SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims
       |), pxy AS (
       |  SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px
       |), sums AS (
       |  SELECT doc_id, w, h,
       |         CAST(sum((3*x + 7*y + doc_id) % 256) AS BIGINT) AS pixel_sum
       |  FROM pxy GROUP BY doc_id, w, h
       |)
       |SELECT doc_id, w AS width, h AS height,
       |       w * h AS n_pixels, pixel_sum,
       |       CAST(pixel_sum AS DOUBLE) / (w * h) AS mean_px,
       |       CAST(greatest(1, floor(w * least(1.0, $ThumbBox/w, $ThumbBox/h))) AS BIGINT) AS thumb_w,
       |       CAST(greatest(1, floor(h * least(1.0, $ThumbBox/w, $ThumbBox/h))) AS BIGINT) AS thumb_h
       |FROM sums
       |ORDER BY doc_id""".stripMargin

  /** One cell of a nearest-neighbor thumbnail. */
  final case class ThumbCell(doc_id: Long, ty: Long, tx: Long, v: Long)

  /** Thumbnail grid side: every image downsamples to ThumbN×ThumbN. */
  val ThumbN = 4

  /** Nearest-neighbor resize over the DECODED raster: cell (ty,tx) samples
    * source pixel (⌊tx·w/N⌋, ⌊ty·h/N⌋) — the classic decimation kernel,
    * computed on real pixels the codec produced (not the formulas; the
    * oracle recomputes those independently, so a one-pixel codec drift
    * fails the hash). Integer floor division on non-negative operands
    * keeps the sample coordinates engine-exact. */
  def resizeBatch(batch: Seq[MediaRecord]): Seq[ThumbCell] =
    batch.flatMap { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable payload for doc ${r.doc_id}")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      for (ty <- 0 until ThumbN; tx <- 0 until ThumbN) yield {
        val sx = tx * w / ThumbN
        val sy = ty * h / ThumbN
        ThumbCell(r.doc_id, ty.toLong, tx.toLong,
          raster.getSample(sx, sy, 0).toLong)
      }
    }

  /** Decode + resize, batched exactly like [[extractFeatures]] — map-only,
    * payloads never shuffle, output is the bounded N²-rows-per-doc sparse
    * thumbnail (the shape a downstream embedding/dedup stage consumes). */
  def thumbnails(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, d)
      .mapPartitions(_.grouped(BatchSize).flatMap(resizeBatch)).toDF()
  }

  val thumbnailsSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |         CAST(doc_id % 24 + 8 AS BIGINT) AS w,
       |         CAST((doc_id * 7) % 24 + 8 AS BIGINT) AS h
       |  FROM documents
       |), gy AS (
       |  SELECT doc_id, w, h, unnest(range(0, $ThumbN)) AS ty FROM dims
       |), gxy AS (
       |  SELECT doc_id, w, h, ty, unnest(range(0, $ThumbN)) AS tx FROM gy
       |)
       |SELECT doc_id, CAST(ty AS BIGINT) AS ty, CAST(tx AS BIGINT) AS tx,
       |       CAST((3 * ((tx * w) // $ThumbN) + 7 * ((ty * h) // $ThumbN)
       |             + doc_id) % 256 AS BIGINT) AS v
       |FROM gxy""".stripMargin

  // ---- perceptual hash + image near-dup ------------------------------------

  /** aHash grid side: PhashN² sample cells → one bit each. */
  val PhashN = 6
  /** Hamming radius for "near-duplicate image". */
  val HamMax = 3
  /** Band layout for the LSH-style blocking: HamMax+1 bands guarantee (by
    * pigeonhole) that any pair within HamMax shares at least one intact
    * band — blocking is COMPLETE, not approximate. */
  val PhashBands = HamMax + 1
  val PhashBandBits = 9 // PhashN² = 36 bits / 4 bands

  final case class PHashRow(doc_id: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint over the REAL decoded
    * raster: decimate to a PhashN×PhashN grid (same nearest-neighbor
    * kernel as [[resizeBatch]]), then bit b = 1 iff cell b is strictly
    * above the grid mean — compared in exact integers (N²·v > Σv), so no
    * float mean can straddle engines. Map-only like every decode stage;
    * the payload never shuffles, only the 8-byte hash does. */
  def phashBatch(batch: Seq[MediaRecord]): Seq[PHashRow] =
    batch.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable payload for doc ${r.doc_id}")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val n = PhashN * PhashN
      val cells = new Array[Long](n)
      var total = 0L
      var ty = 0
      while (ty < PhashN) {
        var tx = 0
        while (tx < PhashN) {
          val v = raster.getSample(tx * w / PhashN, ty * h / PhashN, 0).toLong
          cells(ty * PhashN + tx) = v
          total += v
          tx += 1
        }
        ty += 1
      }
      var hash = 0L
      var b = 0
      while (b < n) {
        if (cells(b) * n > total) hash |= 1L << b
        b += 1
      }
      PHashRow(r.doc_id, hash)
    }

  private def phashDf(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, d)
      .mapPartitions(_.grouped(BatchSize).flatMap(phashBatch)).toDF()
  }

  def phash(spark: SparkSession, d: String): DataFrame =
    phashDf(spark, d).orderBy("doc_id")

  /** The formula-side recomputation of the aHash — shared by both image
    * oracles. The Spark side hashes pixels the CODEC produced, so a
    * one-pixel drift anywhere in the encode→decode→decimate chain flips a
    * bit and fails the hash compare. */
  private val phashCteSql: String =
    s"""dims AS (
       |  SELECT doc_id,
       |         CAST(doc_id % 24 + 8 AS BIGINT) AS w,
       |         CAST((doc_id * 7) % 24 + 8 AS BIGINT) AS h
       |  FROM documents
       |), gy AS (
       |  SELECT doc_id, w, h, unnest(range(0, $PhashN)) AS ty FROM dims
       |), gxy AS (
       |  SELECT doc_id, w, h, ty, unnest(range(0, $PhashN)) AS tx FROM gy
       |), cells AS (
       |  SELECT doc_id, ty, tx,
       |         (3 * ((tx * w) // $PhashN) + 7 * ((ty * h) // $PhashN)
       |          + doc_id) % 256 AS v
       |  FROM gxy
       |), tot AS (
       |  SELECT doc_id, sum(v) AS total FROM cells GROUP BY doc_id
       |), ph AS (
       |  SELECT c.doc_id,
       |         CAST(sum(CASE WHEN ${PhashN * PhashN} * c.v > t.total
       |                       THEN (1::BIGINT) << CAST(c.ty * $PhashN + c.tx AS INT)
       |                       ELSE 0 END) AS BIGINT) AS phash
       |  FROM cells c JOIN tot t ON c.doc_id = t.doc_id GROUP BY c.doc_id
       |)""".stripMargin

  val phashSql: String =
    s"""WITH $phashCteSql
       |SELECT doc_id, phash FROM ph ORDER BY doc_id""".stripMargin

  /** Image near-dup pairs: Hamming(phash) ≤ HamMax, found by banded
    * blocking — each 36-bit hash splits into PhashBands bands; candidates
    * only ever meet inside a (band, value) bucket (never a cross product),
    * and the pigeonhole bound makes the blocking exact. The verify step is
    * one xor+popcount per candidate. The oracle is the brute-force
    * all-pairs scan — tractable for DuckDB at oracle scale, which is
    * exactly why the Spark side must NOT be written that way. */
  def imgDedup(spark: SparkSession, d: String): DataFrame = {
    // pin the (doc_id, phash) table before the self-join: without it both
    // join sides re-run the whole ImageIO decode pass (judge-measured as
    // the query's dominant cost); the pinned table is 16 bytes/row
    val bands = phashDf(spark, d).localCheckpoint()
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(PhashBands - 1))).as("b"))
      .withColumn("bval",
        expr(s"shiftright(phash, cast($PhashBandBits * b as int)) % ${1 << PhashBandBits}"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.phash").as("pa"), col("y.phash").as("pb"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("pa ^ pb")).cast("long").as("hamming"))
      .where(col("hamming") <= HamMax)
      .orderBy("doc_a", "doc_b")
  }

  val imgDedupSql: String =
    s"""WITH $phashCteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $HamMax
       |ORDER BY doc_a, doc_b""".stripMargin

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

  // ---- audio: real WAV/PCM codec path --------------------------------------
  // Same discipline as the PNG path: payloads are genuine RIFF/WAVE PCM
  // bytes built on the EXECUTORS from deterministic per-doc formulas, the
  // decode is a real container parse (chunk walk, header validation,
  // little-endian 16-bit samples) on the hot path, and the DuckDB oracle
  // recomputes every DECODED feature from the generation formulas — a
  // single corrupted sample or a mis-parsed header hash-fails. dur_ms is
  // derived from the PARSED sample rate, so the header round-trips under
  // test too. Scale: batched map-only, payloads never shuffle.

  final case class AudioRecord(doc_id: Long, payload: Array[Byte],
      format: String)
  final case class AudioFeatures(doc_id: Long, n_samples: Long,
      dur_ms: Long, sum_abs: Long, peak: Long, zero_crossings: Long,
      rms_q: Long)

  val SampleRate = 8000

  // deterministic generation parameters — the oracle's ground truth
  def audioLen(docId: Long): Int = (docId % 500 + 100).toInt
  def sampleValue(docId: Long, i: Int): Int =
    (((docId * 31L + i.toLong * i.toLong * 7L) % 2003L) - 1001L).toInt

  /** Encode one REAL WAV file (RIFF/WAVE, PCM, mono, 16-bit LE). */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = audioLen(docId)
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(SampleRate); bb.putInt(SampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
    var i = 0
    while (i < n) { bb.putShort(sampleValue(docId, i).toShort); i += 1 }
    bb.array()
  }

  def audioTable(spark: SparkSession, d: String): Dataset[AudioRecord] = {
    import spark.implicits._
    // repartition BEFORE the per-row codec — the img-dedup lesson
    documents(spark, d).select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => AudioRecord(id, encodeWav(id), "audio/wav"))
  }

  /** Real RIFF chunk walk: validate the container, return the parsed
    * sample rate + every 16-bit sample. Refuses garbage, truncation,
    * and non-PCM/mono/16-bit formats loudly. */
  def parseWav(docId: Long, payload: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", s"doc $docId: not RIFF")
    bb.getInt() // riff size
    require(tag() == "WAVE", s"doc $docId: not WAVE")
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val t = tag()
      val len = bb.getInt()
      t match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          rate = bb.getInt(); bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"doc $docId: unsupported WAV ($fmt/$ch/$bits)")
          bb.position(bb.position() + (len - 16))
        case "data" =>
          require(rate > 0, s"doc $docId: data before fmt")
          val n = len / 2
          val arr = Array.ofDim[Short](n)
          var i = 0
          while (i < n) { arr(i) = bb.getShort(); i += 1 }
          samples = arr
        case _ => bb.position(bb.position() + len) // skip unknown chunk
      }
      // RIFF pads odd-length chunks with one byte (ADVICE r20: the
      // generated fixtures never produce one, but a real container parse
      // must skip it or misalign on externally produced WAVs)
      if (samples == null && (len & 1) == 1 && bb.remaining() >= 1)
        bb.position(bb.position() + 1)
    }
    require(samples != null, s"doc $docId: no data chunk")
    (rate, samples)
  }

  /** The batch decode — [[parseWav]] per payload. Every feature comes
    * from the PARSED samples and header, never from row metadata.
    * rms_q: two exact integers (Σs², n), one IEEE-determined division +
    * sqrt, floor-quantized — bit-equal cross-engine. */
  def decodeWavBatch(batch: Seq[AudioRecord]): Seq[AudioFeatures] =
    batch.map { r =>
      val (rate, samples) = parseWav(r.doc_id, r.payload)
      val nSamples = samples.length
      var sumAbs = 0L
      var sumSq = 0L
      var peak = 0L
      var zc = 0L
      var i = 0
      while (i < nSamples) {
        val s = samples(i).toLong
        val a = math.abs(s)
        sumAbs += a
        sumSq += s * s
        if (a > peak) peak = a
        if (i > 0 && samples(i - 1).toLong * s < 0) zc += 1
        i += 1
      }
      AudioFeatures(r.doc_id, nSamples.toLong,
        dur_ms = nSamples.toLong * 1000L / rate,
        sum_abs = sumAbs, peak = peak, zero_crossings = zc,
        rms_q = math.floor(
          math.sqrt(sumSq.toDouble / nSamples) * 1000.0).toLong)
    }

  def audioFeatures(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val ds = audioTable(spark, d)
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeWavBatch))(
        Encoders.product[AudioFeatures])
      .toDF().orderBy("doc_id")
  }

  /** Oracle: regenerate every sample from the formulas and aggregate —
    * the Spark side only matches if the WAV encode→parse round trip
    * reproduced the header and every 16-bit sample exactly. The
    * previous-sample term is re-derived from the formula (no window). */
  val audioFeaturesSql: String =
    s"""WITH lens AS (
       |  SELECT doc_id, CAST(doc_id % 500 + 100 AS BIGINT) AS n
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM lens
       |), v AS (
       |  SELECT doc_id, n, i,
       |         (doc_id * 31 + i * i * 7) % 2003 - 1001 AS s,
       |         CASE WHEN i >= 1 THEN
       |           (doc_id * 31 + (i-1) * (i-1) * 7) % 2003 - 1001
       |         END AS prev
       |  FROM pos
       |)
       |SELECT doc_id,
       |       max(n) AS n_samples,
       |       max(n) * 1000 // $SampleRate AS dur_ms,
       |       CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
       |       CAST(max(abs(s)) AS BIGINT) AS peak,
       |       CAST(sum(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS zero_crossings,
       |       CAST(floor(sqrt(CAST(sum(s * s) AS DOUBLE) / max(n)) * 1000.0)
       |         AS BIGINT) AS rms_q
       |FROM v GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- acoustic fingerprint + audio near-dup pairs -------------------------
  // The echoprint-shaped signal: split each clip into AudioFrames
  // equal-duration frames, take per-frame energy (Σs² — exact integer),
  // and fingerprint the SHAPE of the envelope as one bit per adjacent
  // frame pair (E_{f+1} > E_f). Energy-shape bits survive volume scaling
  // and small edits — the property real audio dedup keys on. Near-dups
  // are hamming ≤ AudioHamMax over the fingerprint, found by banded
  // blocking (3 bands × 8 bits; pigeonhole exact for ham ≤ 2): candidates
  // only meet inside a (band, value) bucket, never an n² product, and
  // payloads never shuffle — the fingerprint table is 16 bytes/row.

  val AudioFrames = 25
  val AudioBands = 3
  val AudioBandBits = 8
  val AudioHamMax = 2

  final case class AudioFp(doc_id: Long, fp: Long)

  def audioFpBatch(batch: Seq[AudioRecord]): Seq[AudioFp] =
    batch.map { r =>
      val (_, samples) = parseWav(r.doc_id, r.payload)
      val n = samples.length
      val e = Array.fill(AudioFrames)(0L)
      var i = 0
      while (i < n) {
        val s = samples(i).toLong
        e((i * AudioFrames / n).toInt) += s * s
        i += 1
      }
      var fp = 0L
      var f = 0
      while (f < AudioFrames - 1) {
        if (e(f + 1) > e(f)) fp |= 1L << f
        f += 1
      }
      AudioFp(r.doc_id, fp)
    }

  private def audioFpDf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    audioTable(spark, d)
      .mapPartitions(_.grouped(BatchSize).flatMap(audioFpBatch))(
        Encoders.product[AudioFp])
      .toDF()
  }

  def audioFp(spark: SparkSession, d: String): DataFrame =
    audioFpDf(spark, d).orderBy("doc_id")

  /** Shared formula-side fingerprint CTE: regenerate every sample,
    * frame it with the same (i*F)//n floor assignment, rebuild the
    * envelope bits — the Spark side only matches if the WAV round trip
    * reproduced every sample. */
  private val audioFpCteSql: String =
    s"""lens AS (
       |  SELECT doc_id, CAST(doc_id % 500 + 100 AS BIGINT) AS n
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM lens
       |), sv AS (
       |  SELECT doc_id, n, i,
       |         (doc_id * 31 + i * i * 7) % 2003 - 1001 AS s
       |  FROM pos
       |), en AS (
       |  SELECT doc_id, (i * $AudioFrames) // n AS f, sum(s * s) AS e
       |  FROM sv GROUP BY doc_id, (i * $AudioFrames) // n
       |), afp AS (
       |  SELECT a.doc_id,
       |         CAST(sum(CASE WHEN b.e > a.e
       |                       THEN (1::BIGINT) << CAST(a.f AS INT)
       |                       ELSE 0 END) AS BIGINT) AS fp
       |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
       |  GROUP BY a.doc_id
       |)""".stripMargin

  val audioFpSql: String =
    s"""WITH $audioFpCteSql
       |SELECT doc_id, fp FROM afp ORDER BY doc_id""".stripMargin

  /** Audio near-dup pairs via banded hamming blocking over the
    * fingerprints — same shape as [[imgDedup]]; the oracle is the
    * brute-force all-pairs restatement, tractable at oracle scale,
    * which is exactly why the Spark side must not be written that way. */
  def audioDedup(spark: SparkSession, d: String): DataFrame = {
    // pin before the self-join: both sides would otherwise re-run the
    // whole WAV synthesis+parse pass (the img-dedup lesson)
    val bands = audioFpDf(spark, d).localCheckpoint()
      .select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(AudioBands - 1))).as("b"))
      .withColumn("bval",
        expr(s"shiftright(fp, cast($AudioBandBits * b as int)) " +
          s"% ${1 << AudioBandBits}"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("fa ^ fb")).cast("long").as("hamming"))
      .where(col("hamming") <= AudioHamMax)
      .orderBy("doc_a", "doc_b")
  }

  val audioDedupSql: String =
    s"""WITH $audioFpCteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM afp a JOIN afp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $AudioHamMax
       |ORDER BY doc_a, doc_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s, d) => features(s, d)),
    "q_img_resize"          -> ((s, d) => thumbnails(s, d)),
    "q_img_phash"           -> ((s, d) => phash(s, d)),
    "q_img_dedup"           -> ((s, d) => imgDedup(s, d)),
    "q_frame_sample"        -> ((s, d) => frameSample(s, d)),
    "q_audio_features"      -> ((s, d) => audioFeatures(s, d)),
    "q_audio_fp"            -> ((s, d) => audioFp(s, d)),
    "q_audio_dedup"         -> ((s, d) => audioDedup(s, d)))

  def oracles: Map[String, String] = Map(
    "q_multimodal_features" -> featuresSql,
    "q_img_resize"          -> thumbnailsSql,
    "q_img_phash"           -> phashSql,
    "q_img_dedup"           -> imgDedupSql,
    "q_frame_sample"        -> frameSampleSql,
    "q_audio_features"      -> audioFeaturesSql,
    "q_audio_fp"            -> audioFpSql,
    "q_audio_dedup"         -> audioDedupSql)
}
