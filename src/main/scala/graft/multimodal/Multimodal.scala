package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    first_code: Long, byte_sum_mod: Long)

  val FrameSize = 64

  /** Synthesize the binary column from text (UTF-8 bytes stand in for
    * media payloads; deterministic). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"))

  /** Expression-level metadata: no decode needed — length, frame count,
    * first byte. This is what a catalog/manifest pass computes at scale
    * without touching payload bytes. */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      floor((octet_length(col("media")) + lit(FrameSize - 1)) / lit(FrameSize))
        .cast("long").as("n_frames"),
      // first byte as unsigned int
      expr("cast(conv(hex(substring(media, 1, 1)), 16, 10) as bigint)").as("first_code"))

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
        // STUB decode: per-frame "feature" = byte sum; real impl would
        // decode each frame and extract features here.
        def decodeFrame(off: Int): Long = {
          var s = 0L
          var i = off
          val end = math.min(off + FrameSize, bytes.length)
          while (i < end) { s += bytes(i) & 0xff; i += 1 }
          s
        }
        val sum = (0 until nFrames).map(f => decodeFrame(f * FrameSize)).sum % 1000000007L
        MediaFeature(d.doc_id, bytes.length.toLong, nFrames.toLong,
          if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L, sum)
      }
    }
  }
}
