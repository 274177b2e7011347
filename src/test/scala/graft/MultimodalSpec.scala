package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "abc"))
    .toDF("doc_id", "text")

  test("envelope carries payload + typed metadata") {
    val obj = Multimodal.fromText(docs)
    val schema = obj.schema("obj").dataType.sql
    assert(schema.contains("payload: BINARY") || schema.contains("payload BINARY"))
    val r = obj.filter($"doc_id" === 1L).select(
      $"obj.meta.n_bytes", $"obj.meta.format", $"obj.meta.content_id").head()
    assert(r.getInt(0) == 11)
    assert(r.getString(1) == "text/plain")
    // md5("hello world")
    assert(r.getString(2) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("feature stub is deterministic, content-addressed, bounded") {
    val feats = Multimodal.extract(Multimodal.fromText(docs))
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(feats(1L) == feats(2L), "same content, same features")
    assert(feats(1L) != feats(3L))
    assert(feats(1L).length == 8 && feats(1L).forall(f => f >= 0 && f < 65536))
  }

  test("frame fingerprints cover the payload in order") {
    val fr = Multimodal.extract(Multimodal.fromText(docs))
      .filter($"doc_id" === 1L).select($"frames").head().getSeq[String](0)
    assert(fr.length == 4 && fr.distinct.length == 4)
    // first frame of "hello world" = bytes 1..2 = "he"
    val he = docs.sparkSession.sql("SELECT md5('he')").head().getString(0)
    assert(fr.head == he)
  }

  test("batched decode matches per-row semantics across batch sizes") {
    val objects = Multimodal.fromText(docs)
    def run(bs: Int) = Multimodal.decodeBatched(objects, bs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val one = run(1)
    assert(run(64) == one, "batch size must not change results")
    assert(one.size == 3)
    val hw = one.find(_._1 == 1L).get
    assert(hw._2 == 11)
    assert(one.find(_._1 == 2L).get._3 == hw._3, "same payload, same checksum")
  }

  test("formatSummary aggregates per format") {
    val s = Multimodal.formatSummary(
      Multimodal.extract(Multimodal.fromText(docs))).head()
    assert(s.getAs[String]("format") == "text/plain")
    assert(s.getAs[Long]("n_objects") == 3L)
    assert(s.getAs[Long]("n_distinct") == 2L) // two identical payloads
    assert(s.getAs[Long]("total_bytes") == 25L)
  }

  test("real PNG decode: dims, channel sums, luma fingerprint; corrupt payload falls back") {
    import graft.multimodal.Images
    val id = 7L
    val df = Seq(
      (id, Images.fixturePng(id)),              // real PNG
      (8L, Array[Byte](1, 2, 3)),                // garbage bytes
      (9L, "not an image at all".getBytes("UTF-8"))) // text bytes
      .toDF("doc_id", "payload")
    val out = Images.decodeImages(df).collect().sortBy(_.doc_id)
    val ok = out(0)
    // id=7: w=4+7%5=6, h=3+7%4=6, g=49, b=91, red gradient 7..12
    assert(ok.decoded)
    assert(ok.width.contains(6) && ok.height.contains(6))
    assert(ok.sum_r.contains(6L * (7 to 12).sum))
    assert(ok.sum_g.contains(36L * 49) && ok.sum_b.contains(36L * 91))
    // luma fp over samples x=0,1,3,4 → r=7,8,10,11
    val expFp = Seq(7, 8, 10, 11).map(r => (77 * r + 150 * 49 + 29 * 91) >> 8)
      .foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(ok.luma_fp.contains(expFp))
    // corrupt payloads: decoded=false, null features, NO exception —
    // the md5 pseudo-feature path stays available for these rows
    out.drop(1).foreach { bad =>
      assert(!bad.decoded && bad.width.isEmpty && bad.sum_r.isEmpty &&
        bad.luma_fp.isEmpty)
    }
  }

  test("BMP fixture decodes to the same features as the PNG fixture") {
    import graft.multimodal.Images
    for (id <- Seq(3L, 7L, 42L, 255L, 1000L)) {
      val png = Images.decodeOne(id, Images.fixturePng(id))
      val bmp = Images.decodeOne(id, Images.fixtureBmp(id))
      assert(bmp.decoded, s"id=$id BMP must decode")
      assert(bmp == png, s"id=$id: containers must carry identical pixels")
    }
    // the two containers really are different byte streams hitting
    // different codecs, not one encoder labeled twice
    assert(!java.util.Arrays.equals(Images.fixturePng(7L), Images.fixtureBmp(7L)))
    assert(new String(Images.fixtureBmp(7L).take(2), "US-ASCII") == "BM")
  }

  test("decode and encode never touch the ImageIO disk cache") {
    import graft.multimodal.Images
    import javax.imageio.ImageIO
    // point the ImageIO cache at a dir that is DELETED after
    // registration: a disk-backed FileCache*Stream (the
    // ImageIO.read(InputStream) default) fails creating its temp file
    // in a nonexistent directory — for EVERY user, unlike a chmod
    // trap, which root walks straight through (and these suites run
    // as root in CI) — surfacing as decoded=false. Memory-cache
    // streams never consult the cache dir.
    val trap = java.nio.file.Files.createTempDirectory("imgcache_trap")
    val prevCache = ImageIO.getCacheDirectory
    val prevUse = ImageIO.getUseCache
    ImageIO.setUseCache(true)
    ImageIO.setCacheDirectory(trap.toFile) // validated at set time...
    java.nio.file.Files.delete(trap)       // ...then pulled out from under
    try {
      val f = Images.decodeOne(7L, Images.fixturePng(7L)) // encode + decode
      assert(f.decoded, "decode must not touch the ImageIO cache dir")
      val b = Images.decodeOne(7L, Images.fixtureBmp(7L))
      assert(b.decoded)
      assert(!java.nio.file.Files.exists(trap),
        "no cache dir may be recreated")
    } finally {
      ImageIO.setCacheDirectory(prevCache)
      ImageIO.setUseCache(prevUse)
    }
  }

  test("resize stub bounds size, strides deterministically, passes small through") {
    import org.apache.spark.sql.functions._
    val big = ("ab" * 100).getBytes("UTF-8") // 200 bytes
    val small = "xyz".getBytes("UTF-8")
    val df = Seq(Tuple1(big), Tuple1(small)).toDF("payload")
      .select(Multimodal.resizeStub(col("payload"), targetBytes = 10)
        .as("resized"))
    val rows = df.collect().map(_.getAs[Array[Byte]](0))
    // 200 bytes / target 10 → stride 20: positions 0,20,...,180 are
    // all 'a' (even offsets of the "ab" repeat)
    assert(rows(0).length == 10)
    assert(rows(0).forall(_ == 'a'.toByte))
    // at-or-under target passes through untouched
    assert(new String(rows(1), "UTF-8") == "xyz")
    // deterministic: same input, same bytes
    val again = df.collect().map(_.getAs[Array[Byte]](0))
    assert(java.util.Arrays.equals(rows(0), again(0)))
  }
}

class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.multimodal.Audio

  test("fixture WAV decodes to the synthesis formulas") {
    val id = 7L
    val f = Audio.decodeOne(id, Audio.fixtureWav(id))
    assert(f.decoded)
    assert(f.sample_rate.contains((8000 + (id % 3) * 4000).toInt))
    assert(f.channels.contains(1))
    val n = (800 + (id % 5) * 80).toInt
    assert(f.n_samples.contains(n.toLong))
    val step = (3 + id % 7).toInt
    val samples = (0 until n).map(i => ((i.toLong * step) % 2001L) - 1000L)
    assert(f.sum_sq.contains(samples.map(s => s * s).sum))
    val env = Array.fill(4)(0L)
    samples.zipWithIndex.foreach { case (s, i) =>
      env(math.min(i * 4 / n, 3)) += math.abs(s)
    }
    assert(Seq(f.env_0, f.env_1, f.env_2, f.env_3).flatten == env.toSeq)
  }

  test("corrupt payloads come back undecoded, never as exceptions") {
    assert(!Audio.decodeOne(1L, null).decoded)
    assert(!Audio.decodeOne(1L, Array[Byte](1, 2, 3)).decoded)
    // right magic, truncated data chunk
    val wav = Audio.fixtureWav(3L)
    assert(!Audio.decodeOne(3L, wav.take(50)).decoded)
    // non-PCM codec id rejected
    val bad = wav.clone(); bad(20) = 7 // fmt codec field
    assert(!Audio.decodeOne(3L, bad).decoded)
    // flipped magic rejected
    val notRiff = wav.clone(); notRiff(0) = 'X'.toByte
    assert(!Audio.decodeOne(3L, notRiff).decoded)
  }
}

class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.multimodal.Video

  test("fixture GIF decodes to the synthesis formulas") {
    for (id <- Seq(0L, 5L, 7L)) {
      val f = Video.decodeOne(id, Video.fixtureGif(id))
      assert(f.decoded, s"id=$id")
      val n = (2 + id % 3).toInt
      assert(f.n_frames.contains(n))
      assert(f.width.contains((4 + id % 5).toInt))
      assert(f.height.contains((3 + id % 4).toInt))
      val lumas = (0 until 4).map { fr =>
        if (fr < n) Some((299L * ((id * 11 + fr * 31) % 256) +
          587L * ((id * 7) % 256) + 114L * ((id * 13) % 256)) / 1000L)
        else None
      }
      assert(Seq(f.luma_0, f.luma_1, f.luma_2, f.luma_3) == lumas,
        s"id=$id: ${Seq(f.luma_0, f.luma_1, f.luma_2, f.luma_3)} vs $lumas")
    }
  }

  test("corrupt GIF payloads come back undecoded") {
    assert(!Video.decodeOne(1L, null).decoded)
    assert(!Video.decodeOne(1L, Array[Byte](0x47, 0x49, 0x46)).decoded)
    assert(!Video.decodeOne(1L, Array.fill[Byte](40)(9)).decoded)
  }
}
