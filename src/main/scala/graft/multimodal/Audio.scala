package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio decode for multimodal columns — a RIFF/WAVE PCM16
  * parser in pure JVM bytes (chunk walk, fmt validation,
  * little-endian sample extraction), closing the audio leg of the
  * media pipeline the way [[Images]] closed the image leg: bytes go
  * through the actual container format, features are actual sample
  * statistics. Undecodable payloads (wrong magic, truncated chunks,
  * non-PCM16 encodings) come back `decoded = false` with null
  * features — one corrupt object never kills the scan; callers keep
  * [[Multimodal.featureStub]] for those rows (and for formats
  * needing native codecs — MP3/AAC stay stubbed, documented).
  *
  * Features per clip: sample rate and channel count (from the fmt
  * chunk), sample count, exact integer sum of squared samples (the
  * RMS numerator — divide and sqrt downstream: both
  * correctly-rounded IEEE ops, so even the float RMS is
  * bit-reproducible), and a 4-bucket absolute-amplitude envelope
  * (exact integers) — the cheap audio-dedup / silence-detection
  * signal.
  *
  * Scale shape: identical to [[Images.decodeImages]] — batched
  * mapPartitions, per-partition init amortized, no shuffle, one
  * scan.
  */
object Audio {

  final case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      sample_rate: Option[Int],
      channels: Option[Int],
      n_samples: Option[Long],
      sum_sq: Option[Long],
      env_0: Option[Long],
      env_1: Option[Long],
      env_2: Option[Long],
      env_3: Option[Long])

  /** Parse one RIFF/WAVE payload; never throws. */
  def decodeOne(id: Long, payload: Array[Byte]): AudioFeatures = {
    val undecoded = AudioFeatures(id, decoded = false,
      None, None, None, None, None, None, None, None)
    if (payload == null || payload.length < 12) return undecoded
    try {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.getInt(0) != 0x46464952 /* "RIFF" */ ||
        buf.getInt(8) != 0x45564157 /* "WAVE" */ ) return undecoded
      var pos = 12
      var rate = -1
      var channels = -1
      var bits = -1
      var dataOff = -1
      var dataLen = -1
      while (pos + 8 <= payload.length) {
        val ckId = buf.getInt(pos)
        val ckLen = buf.getInt(pos + 4)
        if (ckLen < 0 || pos + 8 + ckLen > payload.length) return undecoded
        if (ckId == 0x20746d66 /* "fmt " */ && ckLen >= 16) {
          val codec = buf.getShort(pos + 8)
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
          if (codec != 1) return undecoded // PCM only
        } else if (ckId == 0x61746164 /* "data" */ ) {
          dataOff = pos + 8
          dataLen = ckLen
        }
        pos += 8 + ckLen + (ckLen & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0)
        return undecoded
      val n = dataLen / 2
      var sumSq = 0L
      val env = Array.fill(4)(0L)
      var i = 0
      while (i < n) {
        val s = buf.getShort(dataOff + i * 2).toLong
        sumSq += s * s
        env((i * 4 / n).min(3)) += math.abs(s)
        i += 1
      }
      AudioFeatures(id, decoded = true, Some(rate), Some(channels),
        Some(n.toLong), Some(sumSq),
        Some(env(0)), Some(env(1)), Some(env(2)), Some(env(3)))
    } catch {
      case scala.util.control.NonFatal(_) => undecoded
    }
  }

  /** Decode a (doc_id, payload) frame in `batchSize`-row groups —
    * same batch shape as [[Images.decodeImages]].
    */
  def decodeAudio(objects: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", batchSize: Int = 64): Dataset[AudioFeatures] = {
    implicit val enc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
    objects.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
        }
      }
  }

  /** Deterministic fixture WAV for a document id: PCM16 mono,
    * sample rate `8000 + (id%3)·4000`, `800 + (id%5)·80` samples of
    * the integer sawtooth `((i · (3 + id%7)) mod 2001) − 1000` — sin
    * would not be bit-reproducible in an external engine, the
    * sawtooth is. Every decoded feature is an integer formula over
    * id, so the oracle recomputes them all: a header-offset,
    * endianness, or alignment bug in the parser cannot hash-match.
    */
  def fixtureWav(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 3) * 4000).toInt
    val n = (800 + (id % 5) * 80).toInt
    val step = (3 + id % 7).toInt
    val dataLen = n * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x46464952)          // RIFF
    buf.putInt(36 + dataLen)        // riff size
    buf.putInt(0x45564157)          // WAVE
    buf.putInt(0x20746d66)          // fmt_
    buf.putInt(16)                  // fmt chunk size
    buf.putShort(1)                 // PCM
    buf.putShort(1)                 // mono
    buf.putInt(rate)
    buf.putInt(rate * 2)            // byte rate
    buf.putShort(2)                 // block align
    buf.putShort(16)                // bits
    buf.putInt(0x61746164)          // data
    buf.putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((i.toLong * step) % 2001L) - 1000L).toShort)
      i += 1
    }
    buf.array()
  }
}
