package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal (image/audio/video) columns as opaque BINARY + typed metadata
  * (builder-prompt north star; no reference analog — the reference is
  * numeric-only).
  *
  * Design for 100 TB: media bytes travel as a BINARY column next to typed
  * metadata; per-record codec work runs inside `mapPartitions` over the
  * typed Dataset — the Scala analog of `mapInPandas` (per-partition batch
  * iterator, no driver collect, no shuffle added by the transform itself).
  * Decode/resize/frame-sample change only partition-local rows, so the
  * pipeline scales linearly with partitions.
  *
  * The codec is PLUGGABLE ([[Multimodal.MediaCodec]]): the deterministic
  * fake codec (header-described synthetic media) keeps every contract
  * operator DuckDB-oracle-checkable, and [[Multimodal.ImageIoCodec]] is a
  * REAL image decoder over the JDK's public javax.imageio, proven through
  * the same downstream operators in MultimodalSpec. Audio/video decode
  * stays external (no public codec in the JDK). The Spark-side plumbing —
  * schema, binary encoding, batch iteration, partitioning — is identical
  * for every codec.
  *
  * Fake wire format (8-byte header + payload):
  *   bytes 0-1  magic "MM"
  *   byte  2    kind: 0=image 1=audio 2=video
  *   byte  3    channels
  *   bytes 4-5  width  (big-endian u16)
  *   bytes 6-7  height (big-endian u16)
  *   payload    the document text's UTF-8 bytes ("pixels"/"samples")
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, data: Array[Byte])
  case class Decoded(doc_id: Long, kind: String, channels: Int,
                     width: Int, height: Int, pixels: Array[Byte])
  case class Frame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  val Kinds = Seq("image", "audio", "video")
  val HeaderLen = 8
  val FrameBytes = 32

  def kindOf(docId: Long): String = Kinds((docId % 3).toInt)
  def widthOf(docId: Long): Int = 16 + (docId % 48).toInt
  def heightOf(docId: Long): Int = 16 + ((docId * 7) % 32).toInt
  def channelsOf(docId: Long): Int = if (docId % 3 == 0) 3 else 1

  /** Media ingest from any (doc_id, text) frame → (doc_id, kind, data
    * BINARY). Deterministic, so every downstream operator has an exact
    * arithmetic oracle. */
  def mediaFrom(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload = text.getBytes(StandardCharsets.UTF_8)
        val w = widthOf(id); val h = heightOf(id)
        val header = Array[Byte]('M', 'M',
          (id % 3).toByte, channelsOf(id).toByte,
          (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte)
        MediaRow(id, kindOf(id), header ++ payload)
      })
  }

  /** Media ingest of the driver documents table. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] =
    mediaFrom(Tables.table(spark, dir, "documents"))

  /** The codec boundary: bytes → typed Decoded. Implementations must be
    * serializable (they run inside executor-side mapPartitions). */
  trait MediaCodec extends Serializable {
    def decode(docId: Long, data: Array[Byte]): Decoded
  }

  /** The deterministic fake codec over the synthetic wire format above —
    * what the DuckDB-oracled contract queries run, so results stay exact
    * across engines. */
  object FakeCodec extends MediaCodec {
    def decode(docId: Long, d: Array[Byte]): Decoded = {
      require(d.length >= HeaderLen && d(0) == 'M' && d(1) == 'M',
        s"bad media header for doc $docId")
      Decoded(docId, Kinds(d(2).toInt), d(3).toInt,
        ((d(4) & 0xff) << 8) | (d(5) & 0xff),
        ((d(6) & 0xff) << 8) | (d(7) & 0xff),
        d.drop(HeaderLen))
    }
  }

  /** REAL image decode through the JDK's public javax.imageio —
    * PNG/JPEG/GIF/BMP bytes → row-major interleaved pixel bytes (RGB for
    * color models, single luminance-ish channel otherwise). The optional
    * production implementation of the boundary: the SAME downstream
    * operators (byteHistogram, resize, media dedup) run unchanged on its
    * output — MultimodalSpec proves it on an in-memory-encoded PNG.
    * Audio/video remain codec-less in this container (no public decoder
    * in the JDK); they keep the fake codec or an external impl. */
  object ImageIoCodec extends MediaCodec {
    def decode(docId: Long, data: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(data))
      require(img != null, s"doc $docId: bytes are not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val ch = if (img.getColorModel.getNumComponents >= 3) 3 else 1
      val out = new Array[Byte](w * h * ch)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // sRGB regardless of storage format
          if (ch == 3) {
            out(i) = (rgb >> 16).toByte
            out(i + 1) = (rgb >> 8).toByte
            out(i + 2) = rgb.toByte
            i += 3
          } else {
            out(i) = rgb.toByte
            i += 1
          }
          x += 1
        }
        y += 1
      }
      Decoded(docId, "image", ch, w, h, out)
    }
  }

  /** Decode a media stream through any codec implementation — the shared
    * per-partition batch plumbing (the mapInPandas shape); the codec is
    * the only moving part. */
  def decodeWith(media: Dataset[MediaRow], codec: MediaCodec): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => codec.decode(m.doc_id, m.data)))
  }

  /** Decode the fake wire format: header → typed metadata, payload →
    * "pixels". The oracle-deterministic default. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] =
    decodeWith(media, FakeCodec)

  /** Feature extraction: 16-bin byte histogram over the payload — the
    * deterministic stand-in for an embedding model forward pass. */
  def byteHistogram(decoded: Dataset[Decoded]): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { d =>
      val hist = new Array[Long](16)
      d.pixels.foreach(b => hist((b & 0xff) / 16) += 1)
      (d.doc_id, hist)
    }).toDF("doc_id", "hist")
  }

  /** Resize: keep every `factor`-th pixel byte, recompute dims. The fake
    * twin of an image downscale — output size contracts by the factor. */
  def resize(decoded: Dataset[Decoded], factor: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map { d =>
      val px = d.pixels.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
      d.copy(width = math.max(1, d.width / factor),
        height = math.max(1, d.height / factor), pixels = px)
    })
  }

  /** Frame sampling: slice a video payload into fixed-size frames —
    * flatMap, one row per frame, order-stable via frame_no. */
  def frameSample(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      m.data.drop(HeaderLen).grouped(FrameBytes).zipWithIndex
        .map { case (chunk, i) => Frame(m.doc_id, i, chunk) }
    })
  }
}
