package graft

import graft.operators.Multimodal

/** Real BMP decode path: encode/decode round-trip (including the 4-byte
  * row padding and bottom-up storage order), malformed-payload rejection,
  * closed-form channel stats, and the kind dispatch in extractFeatures.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("BMP round-trip preserves every pixel (padded width, bottom-up rows)") {
    // width 3 -> rowSize 12 (3 pad bytes per row): exercises padding
    val enc = Multimodal.encodeBmp(3, 2, (x, y) => (x * 10 + y, 100 + x, 200 + y))
    assert(enc.length === 54 + 12 * 2)
    assert(enc(0) === 'B'.toByte && enc(1) === 'M'.toByte)
    val img = Multimodal.decodeBmp(enc)
    assert(img.width === 3 && img.height === 2)
    for (x <- 0 until 3; y <- 0 until 2) {
      assert(img.channel(x, y, 0) === x * 10 + y, s"R at ($x,$y)")
      assert(img.channel(x, y, 1) === 100 + x, s"G at ($x,$y)")
      assert(img.channel(x, y, 2) === 200 + y, s"B at ($x,$y)")
    }
  }

  test("decode rejects malformed payloads") {
    val ok = Multimodal.encodeBmp(4, 4, (_, _) => (1, 2, 3))
    // wrong magic
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeBmp(badMagic))
    // truncated pixel data
    intercept[IllegalArgumentException](Multimodal.decodeBmp(ok.take(60)))
    // truncated header
    intercept[IllegalArgumentException](Multimodal.decodeBmp(ok.take(10)))
    // unsupported bpp (offset 28 = bpp in BITMAPINFOHEADER)
    val bad8 = ok.clone(); bad8(28) = 8.toByte
    intercept[IllegalArgumentException](Multimodal.decodeBmp(bad8))
  }

  test("synthetic BMP stats match their closed forms (the oracle's algebra)") {
    for (id <- Seq(0L, 1L, 15L, 16L, 199L, 200L, 12345L)) {
      val img = Multimodal.decodeBmp(Multimodal.syntheticBmp(id))
      val w = 1 + (id % 16).toInt
      val h = 1 + (id % 8).toInt
      assert(img.width === w && img.height === h, s"dims for id $id")
      var sr = 0L
      for (x <- 0 until w; y <- 0 until h) {
        assert(img.channel(x, y, 1) === ((id * 3 + 7) % 256).toInt)
        assert(img.channel(x, y, 2) === ((id * 5 + 11) % 256).toInt)
        sr += img.channel(x, y, 0)
      }
      assert(sr.toDouble / (w * h) === (id % 200) + (w - 1) / 2.0, s"mean_r for id $id")
    }
  }

  test("WAV round-trip preserves samples; chunk walker skips unknown chunks") {
    val samples = Array.tabulate(100)(i => (i * 37 - 500).toShort)
    val enc = Multimodal.encodeWav(16000, samples)
    assert(enc.length === 44 + 200)
    val a = Multimodal.decodeWav(enc)
    assert(a.sampleRate === 16000 && a.channels === 1)
    assert(a.samples.toSeq === samples.toSeq)
    // splice an unknown (odd-sized, word-padded) chunk between fmt and data:
    // a real reader must skip it and still find the samples
    val head = enc.take(36) // RIFF..WAVE + fmt chunk
    val junk = Array[Byte]('j', 'u', 'n', 'k', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = head ++ junk ++ enc.drop(36)
    val b = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.position(4); b.putInt(spliced.length - 8) // fix riff size
    val a2 = Multimodal.decodeWav(spliced)
    assert(a2.samples.toSeq === samples.toSeq)
  }

  test("WAV decode rejects malformed payloads") {
    val ok = Multimodal.encodeWav(8000, Array[Short](1, 2, 3, 4))
    val bad = ok.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    intercept[IllegalArgumentException](Multimodal.decodeWav(ok.take(20)))
    // non-PCM format code
    val nonPcm = ok.clone(); nonPcm(20) = 3.toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(nonPcm))
  }

  test("synthetic WAV stats match their closed forms") {
    for (id <- Seq(0L, 1L, 63L, 64L, 99L, 100L, 54321L)) {
      val a = Multimodal.decodeWav(Multimodal.syntheticWav(id))
      val n = 16 + (id % 64).toInt
      val base = ((id % 100) * 10).toInt
      assert(a.samples.length === n && a.sampleRate === 8000)
      assert(a.samples.map(_.toLong).sum.toDouble / n === base + (n - 1) / 2.0)
      assert(a.samples.max === (base + n - 1).toShort)
    }
  }

  test("extractFeatures dispatches bmp to the real decoder") {
    val payload = Multimodal.syntheticBmp(42L)
    val df = Seq((42L, payload, "bmp"), (43L, payload, "jpeg"))
      .toDF("doc_id", "payload", "kind")
    val got = Multimodal.extractFeatures(df, dim = 8).collect()
      .map(f => f.doc_id -> f).toMap
    // bmp: real header dims
    assert(got(42L).width === 1 + (42 % 16) && got(42L).height === 1 + (42 % 8))
    // stub kinds keep the fake-dims contract (>= 64 by construction)
    assert(got(43L).width >= 64)
    assert(got(42L).feature.length === 8)
  }
}
