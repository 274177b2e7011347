package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL image decode for multimodal columns — the JDK's built-in
  * `javax.imageio` codecs (PNG/BMP/GIF/JPEG, zero native deps), so
  * the decode stage of the media pipeline is no longer a stub: bytes
  * go through an actual codec (PNG = zlib inflate + defilter) and
  * the features are actual pixel statistics. Undecodable payloads
  * (unknown format, truncated file, codec error) come back with
  * `decoded = false` and null features — callers keep the md5
  * pseudo-feature path of [[Multimodal.featureStub]] for those rows,
  * so one corrupt object can never kill a 100 TB scan.
  *
  * Extracted features per image: dimensions, per-channel pixel sums
  * (exact integers — divide by `width*height` for means), and a
  * 4-point downsampled-luma line fingerprint (nearest-neighbor
  * samples along the first row, polynomial-hashed) — the cheap
  * perceptual-dedup signal.
  *
  * Scale shape: pure per-row work behind `mapPartitions` with
  * `batchSize`-row groups — the GPU/codec-feeding batch shape of a
  * `mapInPandas` decode stage; per-partition init is amortized, no
  * shuffle, one scan.
  */
object Images {

  final case class ImageFeatures(
      doc_id: Long,
      decoded: Boolean,
      width: Option[Int],
      height: Option[Int],
      sum_r: Option[Long],
      sum_g: Option[Long],
      sum_b: Option[Long],
      luma_fp: Option[Long])

  private val FpMod = 1000000007L

  /** Decode one payload; never throws (corrupt bytes → decoded=false). */
  def decodeOne(id: Long, payload: Array[Byte]): ImageFeatures = {
    val undecoded =
      ImageFeatures(id, decoded = false, None, None, None, None, None, None)
    if (payload == null) return undecoded
    try {
      // memory-cache stream, NOT ImageIO.read(InputStream): the
      // convenience overload wraps in a disk-backed
      // FileCacheImageInputStream by default — a temp file created and
      // deleted per row is a quiet I/O tax a 100 TB media scan can't
      // carry (payloads are already fully in memory; Video.scala uses
      // the same pattern)
      // NB: unlike the rest of ImageIO, read(ImageInputStream) closes
      // the stream itself — closing again here would throw
      val img = ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(payload)))
      if (img == null) undecoded // no registered codec claims the bytes
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        // 4 nearest-neighbor luma samples along row 0, poly-hashed
        // (integer luma: (77r + 150g + 29b) >> 8 — the classic
        // fixed-point BT.601 weights, exact in any engine)
        var fp = 0L
        var i = 0
        while (i < 4) {
          val p = img.getRGB(math.min(w - 1, i * w / 4), 0)
          val luma = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
            29 * (p & 0xff)) >> 8
          fp = (fp * 31 + luma) % FpMod
          i += 1
        }
        ImageFeatures(id, decoded = true, Some(w), Some(h),
          Some(sr), Some(sg), Some(sb), Some(fp))
      }
    } catch { case scala.util.control.NonFatal(_) => undecoded }
  }

  /** Batched partition-parallel decode: (idCol, payloadCol) in,
    * [[ImageFeatures]] out. One scan, no shuffle.
    */
  def decodeImages(objects: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", batchSize: Int = 64): Dataset[ImageFeatures] = {
    implicit val enc: Encoder[ImageFeatures] = Encoders.product[ImageFeatures]
    objects.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows: Iterator[Row] =>
        // a real deployment initializes its codec/model HERE, once
        rows.grouped(batchSize).flatMap { batch =>
          batch.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
        }
      }
  }

  /** Deterministic fixture PNG for a document id — the corpus has no
    * real media, so the oracle-checkable image is synthesized from
    * the id: `(4 + id%5) x (3 + id%4)` pixels, red = horizontal
    * gradient `(id + x) % 256`, green/blue solid (`id*7 % 256`,
    * `id*13 % 256`). Every decoded feature is then an integer
    * formula over id — exactly what the SQL oracle recomputes,
    * proving the codec path end to end (a wrong inflate, defilter,
    * or channel order lands on different sums).
    */
  def fixturePng(id: Long): Array[Byte] = encode(render(id), "png")

  /** The same deterministic pixel content as [[fixturePng]], encoded
    * as BMP — the second pure-JDK container. Mixing both formats in
    * one column exercises `decodeOne`'s codec dispatch (ImageIO's
    * reader probe) with real traffic, not only corrupt payloads; the
    * decoded features are the identical id formulas either way, so
    * one oracle covers both codecs.
    */
  def fixtureBmp(id: Long): Array[Byte] = encode(render(id), "bmp")

  private def render(id: Long): BufferedImage = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val g = ((id * 7) % 256).toInt
    val b = ((id * 13) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode via an explicit memory-cache stream (same rationale as the
    * read path: the OutputStream convenience overload is disk-backed).
    */
  private[multimodal] def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    try {
      if (!ImageIO.write(img, format, out))
        throw new IllegalStateException(s"no $format writer registered")
      out.flush()
    } finally out.close()
    bos.toByteArray
  }
}
