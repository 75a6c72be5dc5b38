package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.SparkSpec

/** Multimodal plumbing: payload typing, metadata struct, batched
  * per-partition extraction determinism, and metadata-only pruning. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mediaTable: real binary payload + typed metadata struct") {
    val mt = Multimodal.mediaTable(spark, dir)
    assert(mt.schema("payload").dataType === BinaryType)
    assert(mt.schema("meta").dataType.isInstanceOf[StructType])
    assert(mt.select("media_type").distinct().count() === 2) // image, audio
    // payloads are REAL media bytes, decodable row by row
    val magic = mt.select("payload").limit(10).collect()
      .map(r => MediaDecode.decode(r.getAs[Array[Byte]](0)).format).toSet
    assert(magic.subsetOf(Set("bmp", "ppm", "wav")))
  }

  test("extractFeatures: deterministic across batch sizes and runs") {
    val mt = Multimodal.mediaTable(spark, dir)
    val a = Multimodal.extractFeatures(mt, batchSize = 64)
      .orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(mt, batchSize = 7)
      .orderBy("doc_id").collect().toSeq
    assert(a === b) // batch shape must not affect results
    assert(a.nonEmpty)
    val row = a.head // doc_id 0 -> gray.bmp
    assert(row.getAs[String]("format") === "bmp")
    assert((row.getAs[Int]("width"), row.getAs[Int]("height")) === (6, 4))
    assert(row.getAs[Double]("intensity") === 128.0 / 255)
  }

  test("expression path == batched-decoder path (and decoder is injectable)") {
    val mt = Multimodal.mediaTable(spark, dir)
    val viaMapPartitions = Multimodal.extractFeatures(mt)
      .orderBy("doc_id").collect().toSeq
    val viaExpressions = Multimodal.extractFeaturesExpr(mt)
      .orderBy("doc_id").collect().toSeq
    assert(viaMapPartitions === viaExpressions)
    // a custom decoder actually flows through the batched path
    val constant: Multimodal.Decoder =
      _ => MediaDecode.Decoded("x", 1, 2, 3, 4, 5.0, 0.5)
    val custom = Multimodal.extractFeatures(mt, decoder = constant)
      .select("format", "width", "height", "intensity").distinct().collect()
    assert(custom.length === 1)
    assert(custom.head.getString(0) === "x")
  }

  test("MediaDecode: real BMP/PPM/WAV parsing matches planted fixture values") {
    import MediaDecode.Decoded
    def bytes(name: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Multimodal.mediaFixtureDir, name))
    // analytic ground truth from tools/gen_media_fixture.py
    assert(MediaDecode.decode(bytes("gray.bmp")) ===
      Decoded("bmp", 6, 4, 3, 0, 0.0, 128.0 / 255))
    assert(MediaDecode.decode(bytes("tint.bmp")) ===
      Decoded("bmp", 4, 2, 3, 0, 0.0, 20.0 / 255))
    assert(MediaDecode.decode(bytes("rgb.ppm")) ===
      Decoded("ppm", 3, 2, 3, 0, 0.0, 85.0 / 255))
    assert(MediaDecode.decode(bytes("tone.wav")) ===
      Decoded("wav", 0, 0, 1, 8000, 250.0, 0.5))
    assert(MediaDecode.decode(bytes("stereo.wav")) ===
      Decoded("wav", 0, 0, 2, 44100, 100.0, 0.0))
    // undecodable payloads must throw, not silently zero
    intercept[IllegalArgumentException] {
      MediaDecode.decode("not media at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      MediaDecode.decode(bytes("gray.bmp").take(20)) // truncated header
    }
  }

  test("MediaDecode: adversarial headers throw the contract exception, " +
    "never an array fault or a spin") {
    import java.nio.{ByteBuffer, ByteOrder}
    // BMP whose width makes rowBytes+3 overflow Int (715827882*3+3 > 2^31):
    // an Int-math stride goes negative and the truncation require passes
    // vacuously, crashing in the pixel loop instead of throwing.
    val bmp = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte)
    bmp.putInt(10, 54)         // dataOff
    bmp.putInt(18, 715827882)  // width
    bmp.putInt(22, 2)          // height
    bmp.putShort(28, 24)       // bpp
    bmp.putInt(30, 0)          // compression
    val eBmp = intercept[IllegalArgumentException] {
      MediaDecode.decode(bmp.array())
    }
    assert(eBmp.getMessage.contains("truncated BMP"))
    // WAV with a negative chunk length: an unchecked walk never advances.
    val wav = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(24).put("WAVE".getBytes)
    wav.put("fmt ".getBytes).putInt(-8)
    val eWav = intercept[IllegalArgumentException] {
      MediaDecode.decode(wav.array())
    }
    assert(eWav.getMessage.contains("chunk length"))
  }

  test("decodePixels normalizes storage order: BMP bottom-up BGR and " +
    "PPM top-down RGB land in one canonical raster; decodeSamples " +
    "round-trips the PCM payload") {
    def bytes(name: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Multimodal.mediaFixtureDir, name))
    val tint = MediaDecode.decodePixels(bytes("tint.bmp"))
    assert((tint.width, tint.height) === (4, 2))
    // stored BGR (30,20,10) must arrive as canonical RGB (10,20,30)
    assert(tint.rgb.toSeq === Seq.fill(8)(Seq(10, 20, 30)).flatten
      .map(_.toByte))
    val rgb = MediaDecode.decodePixels(bytes("rgb.ppm"))
    assert(rgb.rgb.toSeq === Seq(255, 0, 0, 0, 255, 0, 0, 0, 255,
      255, 0, 0, 0, 255, 0, 0, 0, 255).map(_.toByte))
    val tone = MediaDecode.decodeSamples(bytes("tone.wav"))
    assert((tone.sampleRate, tone.channels) === (8000, 1))
    assert(tone.samples.length === 2000)
    assert(tone.samples(0) === 16384 && tone.samples(1) === -16384)
    intercept[IllegalArgumentException] {
      MediaDecode.decodePixels(bytes("tone.wav")) // not an image
    }
  }

  test("x4 resize halves geometry and pins the resized byte stream; " +
    "x5 frame sampling keeps every 2nd 50 ms frame") {
    val resized = Multimodal.x4ResizedMedia(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(resized === Set(("gray.bmp", 3, 2), ("rgb.ppm", 2, 1),
      ("tint.bmp", 2, 1)))
    val frames = Multimodal.x5FrameSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3)))
    assert(frames.toSeq === Seq(("stereo.wav", 0, 0.0),
      ("tone.wav", 0, 0.5), ("tone.wav", 2, 0.5), ("tone.wav", 4, 0.5)))
  }

  test("x3: decodeFiles runs the real decoder through the injectable " +
    "mapPartitions path") {
    val rows = Multimodal.x3DecodedMedia(spark, dir).collect()
    assert(rows.length === 5)
    val byFile = rows.map(r => r.getAs[String]("file") -> r).toMap
    assert(byFile("gray.bmp").getAs[Int]("width") === 6)
    assert(byFile("tone.wav").getAs[Double]("duration_ms") === 250.0)
    // injectability holds for the real-decoder path too
    val constant: Array[Byte] => MediaDecode.Decoded =
      _ => MediaDecode.Decoded("k", 1, 1, 1, 1, 1.0, 0.25)
    val custom = Multimodal.decodeFiles(spark, Multimodal.mediaFixtureDir,
      decoder = constant).select("format").distinct().collect()
    assert(custom.map(_.getString(0)).toSeq === Seq("k"))
  }

  test("x6: ImageIO compressed decode — PNG recovers the PLANTED raster " +
    "bit-exactly; JPEG matches the committed-decoder goldens") {
    def bytes(name: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Multimodal.compressedFixtureDir, name))
    // PNG is lossless: the decoded canonical raster must equal the
    // generator's planted pixel formula exactly (decoder-independent)
    val png = MediaDecode.decodeCompressedPixels(bytes("png4x2.png"))
    assert((png.width, png.height) === (4, 2))
    val planted = for {
      y <- 0 until 2; x <- 0 until 4
      c <- Seq(40 * x + 10, 40 * y + 20, 20 * x + 10 * y + 30)
    } yield c.toByte
    assert(png.rgb.toSeq === planted)
    assert(MediaDecode.compressedFormat(bytes("png4x2.png")) === "png")
    // JPEG: lossy — pinned to the committed JDK decoder's harvested
    // goldens (QDump 2026-08-16, two fresh-JVM runs byte-identical;
    // re-harvest here AND in the x6 oracle on a JDK change), plus the
    // decoder-independent invariant that the smooth gradient's mean
    // stays within 1/255 of the planted per-channel average (120/255)
    val jpg = MediaDecode.decodeCompressedPixels(bytes("jpg16x16.jpg"))
    assert((jpg.width, jpg.height) === (16, 16))
    assert(MediaDecode.compressedFormat(bytes("jpg16x16.jpg")) === "jpg")
    val mean = jpg.rgb.foldLeft(0L)((a, v) => a + (v & 0xff)).toDouble /
      jpg.rgb.length / 255.0
    assert(math.abs(mean - 120.0 / 255) < 1.0 / 255)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(jpg.rgb)
      .map("%02x".format(_)).mkString
    assert(md5 === "d5516254bd0782927c6bb95404dd87bf")
    // fail-loud contract: non-compressed magic throws
    intercept[IllegalArgumentException] {
      MediaDecode.decodeCompressedPixels(Array[Byte]('B', 'M', 0, 0, 0))
    }
    // gated query runs both files through the mapPartitions path
    val rows = Multimodal.x6CompressedMedia(spark, dir).collect()
    assert(rows.map(_.getAs[String]("file")).toSeq ===
      Seq("jpg16x16.jpg", "png4x2.png"))
    assert(rows.map(_.getAs[String]("pix_md5")).toSeq ===
      Seq("d5516254bd0782927c6bb95404dd87bf",
        "8ef8577c73e8a098fd1c29d07aa221ec"))
  }

  test("x2 meta stats reads only metadata (payload pruned from scan)") {
    val plan = Multimodal.x2MetaStats(spark, dir)
      .queryExecution.executedPlan.toString
    // the parquet scan must not materialize the text payload column
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("text") || !plan.split("ReadSchema")(1).contains("text"),
      s"payload column not pruned:\n$plan")
  }
}
