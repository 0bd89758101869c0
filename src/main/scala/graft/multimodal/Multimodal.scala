package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata. The decode step is STUBBED deterministically (no image/audio
  * libs in this container — see builder brief); everything Spark-side is
  * real: schema, batch iteration via mapPartitions over a typed Dataset,
  * partition-friendly frame sampling, and expression-level metadata.
  */
object Multimodal {

  final case class MediaDoc(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaFeature(doc_id: Long, n_bytes: Long, n_frames: Long,
    first_code: Long, code_sum_mod: Long)

  val FrameSize = 64

  /** Synthesize the binary column from text (UTF-8 bytes stand in for
    * media payloads; deterministic). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"))

  /** Expression-level metadata: length and frame count straight off the
    * payload bytes; first_code is the first UNICODE CODEPOINT of the
    * decoded payload so Spark and the oracle share one definition for
    * non-ASCII content (codepoint, never a raw UTF-8 byte). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      floor((octet_length(col("media")) + lit(FrameSize - 1)) / lit(FrameSize))
        .cast("long").as("n_frames"),
      ascii(decode(col("media"), "UTF-8")).cast("long").as("first_code"))

  /** Frame sampling: every `everyK`-th fixed-size frame of the payload,
    * exploded to one row per sampled frame — the partition-friendly shape
    * a video/audio pipeline uses to thin frames BEFORE the expensive
    * decode (explode is per-row; no shuffle; at 100 TB the frame rows
    * inherit the scan's partitioning). The per-frame "decode" is the
    * deterministic stub (codepoint sum over the frame's span); swap for a
    * real codec call when libs exist. */
  def sampleFrames(docs: DataFrame, everyK: Int = 2): DataFrame = {
    val n = length(col("text"))
    val lastIdx = (ceil(n.cast("double") / FrameSize)).cast("int") - 1
    val idxs = when(n > 0, sequence(lit(0), lastIdx, lit(everyK)))
      .otherwise(array().cast("array<int>"))
    val frame = (i: Column) =>
      col("text").substr(i * FrameSize + 1, lit(FrameSize))
    docs.select(col("doc_id"),
      explode(transform(idxs, i => struct(
        i.as("frame_idx"),
        aggregate(
          transform(split(frame(i), ""), c => ascii(c).cast("long")),
          lit(0L), (acc, x) => acc + x).as("frame_code_sum")))).as("f"))
      .select(col("doc_id"), col("f.frame_idx").cast("long").as("frame_idx"),
        col("f.frame_code_sum"))
  }

  // ---- codec-free binary header parsing -------------------------------------

  /** Deterministic PNG-style container: 4-byte magic ‖ BE32 width ‖ BE32
    * height ‖ payload. Dimensions derive from doc_id so the oracle can
    * verify the ROUND TRIP (synthesize → parse) with independent
    * arithmetic. */
  def withPngContainer(docs: DataFrame): DataFrame = {
    def be32(c: Column) = unhex(lpad(hex(c), 8, "0"))
    docs.select(col("doc_id"),
      concat(
        lit(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        be32(col("doc_id") % 1920 + 16),
        be32(col("doc_id") % 1080 + 16),
        encode(col("text"), "UTF-8")).as("media"))
  }

  /** Header parse WITHOUT a codec — the real first step of any image
    * pipeline (route/filter on dimensions before paying for decode):
    * big-endian uint32 fields lifted straight off the byte slices. Pure
    * expressions (substr → hex → conv), per-row, fuses into the scan. */
  def parsePngHeader(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      conv(hex(substring(col("media"), 5, 4)), 16, 10).cast("long").as("width"),
      conv(hex(substring(col("media"), 9, 4)), 16, 10).cast("long").as("height"),
      (octet_length(col("media")) - 12).cast("long").as("payload_bytes"),
      (hex(substring(col("media"), 1, 4)) === "89504E47").as("magic_ok"))

  /** Deterministic WAV/RIFF-style container — the LITTLE-endian
    * complement of the PNG path (RIFF containers are LE on disk):
    * "RIFF" ‖ LE32 payload size ‖ "WAVE" ‖ LE32 sample rate ‖ LE16
    * channels ‖ payload. Field values derive from doc_id so the oracle
    * verifies the round trip with independent arithmetic. */
  def withWavContainer(docs: DataFrame): DataFrame = {
    def le32(c: Column) = {
      val h = lpad(hex(c), 8, "0")
      unhex(concat(h.substr(7, 2), h.substr(5, 2), h.substr(3, 2), h.substr(1, 2)))
    }
    def le16(c: Column) = {
      val h = lpad(hex(c), 4, "0")
      unhex(concat(h.substr(3, 2), h.substr(1, 2)))
    }
    docs.select(col("doc_id"),
      concat(
        lit("RIFF".getBytes("US-ASCII")),
        le32(octet_length(encode(col("text"), "UTF-8"))),
        lit("WAVE".getBytes("US-ASCII")),
        le32(lit(8000) + (col("doc_id") % 5) * 8000),
        le16(lit(1) + col("doc_id") % 2),
        encode(col("text"), "UTF-8")).as("media"))
  }

  /** LE header parse without a codec: byte-swap via hex-pair reshuffles,
    * pure expressions per row (route/filter audio on rate/channels before
    * paying for decode). */
  def parseWavHeader(media: DataFrame): DataFrame = {
    def le32at(pos: Int) = {
      val h = hex(substring(col("media"), pos, 4))
      conv(concat(h.substr(7, 2), h.substr(5, 2), h.substr(3, 2), h.substr(1, 2)),
        16, 10).cast("long")
    }
    val h16 = hex(substring(col("media"), 17, 2))
    media.select(col("doc_id"),
      le32at(13).as("sample_rate"),
      conv(concat(h16.substr(3, 2), h16.substr(1, 2)), 16, 10).cast("long")
        .as("channels"),
      le32at(5).as("payload_bytes"),
      (hex(substring(col("media"), 1, 4)) === "52494646" &&
        hex(substring(col("media"), 9, 4)) === "57415645").as("magic_ok"))
  }

  /** Deterministic JPEG-style container: SOI ‖ APP0 marker ‖ BE16 length
    * (2 + a doc_id-varying pad, so every doc's SOF sits at a DIFFERENT
    * offset) ‖ pad ‖ SOF0 marker ‖ BE16 len ‖ precision ‖ BE16 height ‖
    * BE16 width ‖ components ‖ payload. The point vs the PNG/WAV paths:
    * JPEG dimensions are NOT at a fixed offset — the parser must read the
    * APP0 length field and indirect through it. */
  def withJpegContainer(docs: DataFrame): DataFrame = {
    def be16(c: Column) = unhex(lpad(hex(c), 4, "0"))
    docs.select(col("doc_id"),
      concat(
        lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)),
        be16(col("doc_id") % 13 + 6),                 // APP0 len = 2 + pad
        encode(expr("repeat('J', CAST(doc_id % 13 + 4 AS INT))"), "US-ASCII"),
        lit(Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00.toByte, 0x0B.toByte,
          0x08.toByte)),                              // SOF0, len 11, prec 8
        be16(col("doc_id") % 1080 + 16),              // height
        be16(col("doc_id") % 1920 + 16),              // width
        lit(Array[Byte](0x03.toByte)),                // components
        encode(col("text"), "UTF-8")).as("media"))
  }

  /** Variable-offset header parse: read the APP0 segment length off bytes
    * 5-6, compute where the SOF0 marker lands, and lift BE16 dims from
    * there — substr with COLUMN positions, still pure per-row expressions
    * that fuse into the scan (the route/filter-on-dimensions step before
    * any decode spend). */
  def parseJpegHeader(media: DataFrame): DataFrame = {
    def be16at(pos: Column) =
      conv(hex(col("media").substr(pos, lit(2))), 16, 10).cast("long")
    val app0Len = be16at(lit(5))
    val sofPos = app0Len + 5                          // SOI(2)+marker(2)+len
    media.select(col("doc_id"),
      be16at(sofPos + 7).as("width"),
      be16at(sofPos + 5).as("height"),
      app0Len.as("app0_len"),
      (octet_length(col("media")) - app0Len - 14).cast("long")
        .as("payload_bytes"),
      (hex(substring(col("media"), 1, 2)) === "FFD8").as("magic_ok"),
      (hex(col("media").substr(sofPos, lit(2))) === "FFC0").as("sof_ok"))
  }

  /** The "decode + feature extract" path: typed Dataset mapPartitions —
    * the Scala analog of a Pandas-UDF batch loop. The per-frame decode is
    * a deterministic fake (byte sum per frame); swap `decodeFrame` for a
    * real codec when libs exist. */
  def features(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaDoc].mapPartitions { it =>
      it.map { d =>
        val bytes = d.media
        val nFrames = (bytes.length + FrameSize - 1) / FrameSize
        // STUB decode: the payload decodes as UTF-8 text and the "feature"
        // is its codepoint sum — codepoints (not raw bytes) so the
        // definition matches the oracle on non-ASCII content. A real impl
        // would decode media frames and extract features here.
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        var sum = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          sum += cp
          i += Character.charCount(cp)
        }
        MediaFeature(d.doc_id, bytes.length.toLong, nFrames.toLong,
          if (s.nonEmpty) s.codePointAt(0).toLong else 0L, sum % 1000000007L)
      }
    }
  }
}
