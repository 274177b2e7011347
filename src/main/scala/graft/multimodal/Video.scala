package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL frame sampling for multimodal video-ish columns — animated
  * GIF through the JDK's ImageIO sequence API (the one multi-frame
  * container the JVM decodes without native codecs), closing the
  * frame-sample leg of the media pipeline the way [[Images]] and
  * [[Audio]] closed stills and audio: bytes go through an actual
  * multi-frame codec, per-frame features are actual pixel
  * statistics. MP4/H.264-family formats still need native decoders
  * and keep the documented [[Multimodal.frameFingerprints]] stub.
  *
  * Features per clip: frame count, dimensions, and the integer luma
  * `(299·r + 587·g + 114·b) div 1000` of the first pixel of each of
  * the first 4 frames — the frame-level dedup/scene-cut signal
  * (exact integers; the fixture writes solid-color frames, which
  * survive GIF palettization exactly, so the oracle can recompute
  * every luma from the synthesis formulas).
  *
  * Scale shape: identical to the other decoders — batched
  * mapPartitions, no shuffle, one scan; corrupt payloads come back
  * `decoded = false`, never an exception.
  */
object Video {

  final case class VideoFeatures(
      doc_id: Long,
      decoded: Boolean,
      n_frames: Option[Int],
      width: Option[Int],
      height: Option[Int],
      luma_0: Option[Long],
      luma_1: Option[Long],
      luma_2: Option[Long],
      luma_3: Option[Long])

  private def luma(img: BufferedImage): Long = {
    val rgb = img.getRGB(0, 0)
    val r = (rgb >> 16) & 0xFF
    val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** Decode one GIF payload; never throws. */
  def decodeOne(id: Long, payload: Array[Byte]): VideoFeatures = {
    val undecoded = VideoFeatures(id, decoded = false,
      None, None, None, None, None, None, None)
    if (payload == null) return undecoded
    try {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return undecoded
      val reader = readers.next()
      val in = new MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        reader.setInput(in, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return undecoded
        val frames = (0 until math.min(n, 4)).map(reader.read)
        val lumas = frames.map(f => Some(luma(f))).padTo(4, None)
        VideoFeatures(id, decoded = true, Some(n),
          Some(frames.head.getWidth), Some(frames.head.getHeight),
          lumas(0), lumas(1), lumas(2), lumas(3))
      } finally {
        reader.dispose()
        in.close()
      }
    } catch {
      case scala.util.control.NonFatal(_) => undecoded
    }
  }

  /** Decode a (doc_id, payload) frame in `batchSize`-row groups. */
  def decodeVideo(objects: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", batchSize: Int = 64): Dataset[VideoFeatures] = {
    implicit val enc: Encoder[VideoFeatures] = Encoders.product[VideoFeatures]
    objects.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
        }
      }
  }

  /** Deterministic fixture GIF for a document id: `2 + id%3` frames
    * of `(4 + id%5) × (3 + id%4)` pixels, frame f SOLID color
    * `((id·11 + f·31)%256, (id·7)%256, (id·13)%256)` — solid frames
    * survive GIF palettization bit-exactly, so every decoded luma is
    * an integer formula over (id, f) the oracle recomputes.
    */
  def fixtureGif(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val n = (2 + id % 3).toInt
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      (0 until n).foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val r = ((id * 11 + f * 31) % 256).toInt
        val g = ((id * 7) % 256).toInt
        val b = ((id * 13) % 256).toInt
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      out.close()
    }
    bos.toByteArray
  }
}
