package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t

/** Multimodal-column plumbing (SURVEY.md §7.4): image/audio/video treated
  * as opaque `binary` payload columns with typed metadata structs, and a
  * REAL per-row decode / feature-extract stage.
  *
  * Every payload in the battery is a real media file decoded by
  * [[MediaDecode]] (pure-JVM BMP/PPM/WAV parsing, no external codecs):
  * the x1 media table attaches the committed fixture payloads to the
  * documents corpus row-by-row, so feature extraction at corpus scale
  * computes width/height/duration/intensity from actual decoded
  * pixels/samples. The Spark shape is the one a 100 TB media pipeline
  * needs:
  *  - payloads as BinaryType columns (never strings — no charset damage);
  *  - metadata as a typed StructType travelling with the payload;
  *  - extraction has TWO paths that MultimodalSpec proves identical: a
  *    native Catalyst expression ([[graft.plans.MediaFeaturesOf]],
  *    codegen'd, the gated x1 hot path) and mapPartitions over a typed
  *    Dataset in bounded BATCHES (batchSize=64) with an
  *    injectable Decoder — the exact shape a vectorized decoder (or GPU
  *    inference step) plugs into, one model/codec init per partition,
  *    not per row; mapPartitions is reserved for decoders that need
  *    per-partition init, never used where an expression fits;
  *  - decoded features land as plain columns, joinable/filterable
  *    downstream with full Catalyst pushdown on the metadata.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Raw media row: payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String,
                      payload: Array[Byte], src: String, n_chars: Long)

  /** Decoded features appended to the media identity — field-for-field
    * [[MediaDecode.Decoded]] plus the payload size. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           format: String, width: Int, height: Int,
                           channels: Int, sample_rate: Int,
                           duration_ms: Double, intensity: Double)

  /** Media table: each document row carries one of the committed REAL
    * media fixtures (BMP/PPM/WAV) as its opaque payload — doc_id % 5
    * selects the file, media_type reflects the actual payload format.
    * The 5 distinct payloads arrive via a broadcast join (metadata-scale
    * build side); at 100 TB the payload column comes from the object
    * store instead and nothing downstream changes. The meta struct stays
    * the document's typed metadata, so metadata-only pruning (x2) is
    * exercised against the same table. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fixtures = s.read.format("binaryFile").load(mediaFixtureDir)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content").as("payload"))
      // stable 0-based index in filename order. Unpartitioned window =
      // single partition, but BOUNDED BY DESIGN: the input is the fixture
      // file LISTING (5 rows, one per committed media file — never
      // corpus-scale), and the oracle keys its VALUES list the same way.
      // Same contract as t8/u10's bounded second-level scans.
      .withColumn("fixture_idx",
        (row_number().over(Window.orderBy("file")) - 1).cast("long"))
      .withColumn("media_type",
        when(col("file").endsWith(".wav"), "audio").otherwise("image"))
    t(s, dir, "documents")
      .withColumn("fixture_idx", col("doc_id") % 5)
      .join(broadcast(fixtures), "fixture_idx")
      .select(col("doc_id"), col("media_type"), col("payload"),
        struct(col("source").as("src"), col("lang"),
          col("n_chars")).as("meta"))
  }

  /** A decoder turns one payload into its [[MediaDecode.Decoded]]
    * features — the plug point for a codec library or model runtime.
    * The default is the real pure-JVM decoder. */
  type Decoder = Array[Byte] => MediaDecode.Decoded

  /** Batched per-partition feature extraction — the mapPartitions shape a
    * vectorized decoder/GPU-inference step plugs into via `decoder` (init
    * once per partition, process in batches of `batchSize`). mapPartitions
    * is justified ONLY for decoders needing per-partition init; the gated
    * x1 uses the codegen'd expression twin
    * ([[graft.plans.MediaFeaturesOf]]) — MultimodalSpec proves the two
    * paths agree on the real decoder. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      decoder: Decoder = MediaDecode.decode): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"),
      col("meta.src").as("src"), col("meta.n_chars").as("n_chars"))
      .as[MediaRow]
      .mapPartitions { it =>
        // init per partition (codec/model handle would be created here)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val d = decoder(r.payload)
            MediaFeatures(r.doc_id, r.media_type, r.payload.length,
              d.format, d.width, d.height, d.channels, d.sampleRate,
              d.durationMs, d.intensity)
          }
        }
      }
      .toDF()
  }

  /** Native-expression twin of [[extractFeatures]]: the same REAL decode
    * as a codegen'd Catalyst expression, so the GATED x1 path stays
    * inside whole-stage codegen — no mapPartitions serialization wall on
    * the hot path. Codegen subexpression elimination evaluates the decode
    * once per row across the extracted fields. */
  def extractFeaturesExpr(media: DataFrame): DataFrame = {
    val feat = org.apache.spark.sql.graftshim.column(
      graft.plans.MediaFeaturesOf(
        org.apache.spark.sql.graftshim.expression(col("payload"))))
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).as("n_bytes"),
      feat.getField("format").as("format"),
      feat.getField("width").as("width"),
      feat.getField("height").as("height"),
      feat.getField("channels").as("channels"),
      feat.getField("sample_rate").as("sample_rate"),
      feat.getField("duration_ms").as("duration_ms"),
      feat.getField("intensity").as("intensity"))
  }

  /** X1: end-to-end media feature extraction (real payload → real decode
    * → feature columns) via the codegen'd expression path. The oracle is
    * the fixtures' planted analytic ground truth joined per row by
    * doc_id % 5 — an independent check of the decoder, not a mirror. */
  val x1MediaFeatures: Q = (s, dir) =>
    extractFeaturesExpr(mediaTable(s, dir))
      .orderBy("doc_id")

  /** One row of [[decodeFiles]] output. */
  case class DecodedRow(file: String, format: String, width: Int,
                        height: Int, channels: Int, sample_rate: Int,
                        duration_ms: Double, intensity: Double)

  /** Committed media fixtures with analytically known dimensions /
    * duration / intensity (tools/gen_media_fixture.py — BMP, PPM, WAV). */
  val mediaFixtureDir = "/root/repo/fixtures/media"

  /** REAL decode through the injectable-Decoder mapPartitions shape:
    * binaryFile scan → per-partition decoder init → typed feature rows.
    * The default decoder is [[MediaDecode.decode]], an actual pure-JVM
    * BMP/PPM/WAV parser — the plug point a codec library or GPU
    * inference step replaces at production scale. */
  def decodeFiles(s: SparkSession, path: String,
                  decoder: Array[Byte] => MediaDecode.Decoded =
                    MediaDecode.decode): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load(path)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (f, bytes) =>
          val d = decoder(bytes)
          DecodedRow(f, d.format, d.width, d.height, d.channels,
            d.sampleRate, d.durationMs, d.intensity)
        }
      }
      .toDF()
  }

  /** X3: real media decode over the committed fixtures — width/height/
    * channels/sample-rate/duration/mean-intensity from actual BMP/PPM/WAV
    * bytes; the oracle is the planted analytic values (t6 precedent:
    * fixture with known ground truth). */
  val x3DecodedMedia: Q = (s, _) =>
    decodeFiles(s, mediaFixtureDir).orderBy("file")

  /** One row of [[x4ResizedMedia]] output. */
  case class ResizedRow(file: String, out_w: Int, out_h: Int,
                        mean_intensity: Double, pix_md5: String)

  /** X4: image RESIZE — nearest-neighbor 2× downsample (even rows/cols
    * of the canonical top-down RGB raster) through the same injectable
    * mapPartitions shape as x3; per image emit the output geometry, the
    * resized mean intensity, and the md5 of the resized byte stream —
    * the md5 pins pixel SELECTION and channel normalization (BMP BGR
    * bottom-up vs PPM RGB top-down must land identically), which a mean
    * alone cannot. Oracle = hand-derived planted values. At 100 TB this
    * is the thumbnail/downsample stage of an image-training pipeline:
    * pure map, output bytes 4× smaller than input. */
  def x4ResizedMedia: Q = (s, _) => {
    import s.implicits._
    s.read.format("binaryFile").load(mediaFixtureDir)
      .filter(!col("path").endsWith(".wav"))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (f, bytes) =>
          val p = MediaDecode.decodePixels(bytes)
          val (ow, oh) = ((p.width + 1) / 2, (p.height + 1) / 2)
          val out = new Array[Byte](ow * oh * 3)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              var c = 0
              while (c < 3) {
                out((y * ow + x) * 3 + c) =
                  p.rgb(((y * 2) * p.width + x * 2) * 3 + c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val sum = out.foldLeft(0L)((a, v) => a + (v & 0xff))
          val md = java.security.MessageDigest.getInstance("MD5").digest(out)
          ResizedRow(f, ow, oh, (sum.toDouble / out.length) / 255.0,
            md.map("%02x".format(_)).mkString)
        }
      }.toDF().orderBy("file")
  }

  /** One row of [[x5FrameSample]] output. */
  case class FrameRow(file: String, frame_idx: Int, frame_ms: Double,
                      level: Double)

  /** X5: audio FRAME-SAMPLE — PCM payloads split into fixed 50 ms
    * frames, every 2nd frame kept (the sampling stride an audio-training
    * pipeline uses to cut decode volume before feature extraction); per
    * kept frame emit its index, duration, and mean |sample|/32768 level.
    * Pure map over payload rows; only complete frames count (trailing
    * partial frames are dropped — the deterministic boundary rule the
    * oracle mirrors). */
  def x5FrameSample: Q = (s, _) => {
    import s.implicits._
    s.read.format("binaryFile").load(mediaFixtureDir)
      .filter(col("path").endsWith(".wav"))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (f, bytes) =>
          val sm = MediaDecode.decodeSamples(bytes)
          val perFrame = sm.sampleRate / 20 * sm.channels // 50 ms
          val nFrames = sm.samples.length / perFrame
          (0 until nFrames by 2).map { fi =>
            var sum = 0L
            var k = fi * perFrame
            while (k < (fi + 1) * perFrame) {
              sum += math.abs(sm.samples(k).toLong); k += 1
            }
            FrameRow(f, fi, 50.0, (sum.toDouble / perFrame) / 32768.0)
          }
        }
      }.toDF().orderBy("file", "frame_idx")
  }

  /** Committed COMPRESSED media fixtures (tools/GenCompressedMedia —
    * planted-pixel PNG + JPEG; derivations in its scaladoc). Separate
    * dir from [[mediaFixtureDir]]: the x1/x2 media table keys payloads
    * by doc_id % 5 over that dir's 5-file listing, which must not
    * change. */
  val compressedFixtureDir = "/root/repo/fixtures/media_compressed"

  /** One row of [[x6CompressedMedia]] output. */
  case class CompressedRow(file: String, format: String, width: Int,
                           height: Int, mean_intensity: Double,
                           pix_md5: String)

  /** X6: COMPRESSED image decode — JPEG/PNG, the formats a production
    * image corpus actually carries (round-20; the x3 battery covers the
    * raw/uncompressed formats) — via javax.imageio (in the JDK, zero
    * new dependencies), through the same injectable mapPartitions shape
    * as x3 and the same canonical top-down-RGB raster contract as
    * x4: per file emit the geometry, the raster mean intensity, and the
    * md5 of the canonical raster bytes — the md5 pins the full pixel
    * stream, which mean/geometry alone cannot. Oracle: PNG rows are
    * ANALYTIC (lossless — any compliant decoder recovers the planted
    * raster bit-exactly); JPEG rows are harvested goldens of the
    * committed JDK decoder output (lossy decode is decoder-defined —
    * the m2Goldens discipline, re-harvest on a JDK change). */
  def x6CompressedMedia: Q = (s, _) => {
    import s.implicits._
    s.read.format("binaryFile").load(compressedFixtureDir)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (f, bytes) =>
          val p = MediaDecode.decodeCompressedPixels(bytes)
          val sum = p.rgb.foldLeft(0L)((a, v) => a + (v & 0xff))
          val md =
            java.security.MessageDigest.getInstance("MD5").digest(p.rgb)
          CompressedRow(f, MediaDecode.compressedFormat(bytes), p.width,
            p.height, (sum.toDouble / p.rgb.length) / 255.0,
            md.map("%02x".format(_)).mkString)
        }
      }.toDF().orderBy("file")
  }

  /** X2: metadata-pushdown scan — filter/aggregate over the typed meta
    * struct WITHOUT touching payloads (at scale this is the pruning that
    * keeps media scans cheap: parquet reads only meta columns). */
  val x2MetaStats: Q = (s, dir) =>
    mediaTable(s, dir)
      .filter(col("meta.n_chars") > 200)
      .groupBy(col("media_type"), col("meta.src").as("src"))
      .agg(count(lit(1)).as("n"), avg(col("meta.n_chars")).as("avg_chars"))
      .orderBy("media_type", "src")

  val queries: Map[String, Q] = Map(
    "x1_media_features" -> x1MediaFeatures,
    "x2_meta_stats" -> x2MetaStats,
    "x3_decoded_media" -> x3DecodedMedia,
    "x4_resized_media" -> x4ResizedMedia,
    "x5_frame_sample" -> x5FrameSample,
    "x6_compressed_media" -> x6CompressedMedia,
  )

  val oracle: Map[String, String] = Map(
    // Planted analytic ground truth of the committed fixtures (same
    // derivations as the x3 oracle, tools/gen_media_fixture.py), joined
    // per document row by the doc_id % 5 payload assignment — checks the
    // per-row decode independently of the engine's decoder. n_bytes are
    // the committed files' byte sizes.
    "x1_media_features" ->
      """SELECT d.doc_id, f.media_type, f.n_bytes, f.format, f.width,
           f.height, f.channels, f.sample_rate,
           CAST(f.duration_ms AS DOUBLE) AS duration_ms,
           CAST(f.intensity AS DOUBLE) AS intensity
         FROM documents d
         JOIN (VALUES
           (0, 'image', 134,   'bmp', 6, 4, 3, 0,     0.0,   128.0/255),
           (1, 'image', 39,    'ppm', 3, 2, 3, 0,     0.0,   85.0/255),
           (2, 'audio', 17684, 'wav', 0, 0, 2, 44100, 100.0, 0.0),
           (3, 'image', 78,    'bmp', 4, 2, 3, 0,     0.0,   20.0/255),
           (4, 'audio', 4044,  'wav', 0, 0, 1, 8000,  250.0, 0.5))
           f(idx, media_type, n_bytes, format, width, height, channels,
             sample_rate, duration_ms, intensity)
           ON CAST(d.doc_id % 5 AS INT) = f.idx
         ORDER BY d.doc_id""",
    // Planted analytic ground truth for the committed fixtures
    // (tools/gen_media_fixture.py derivations in its docstring) — an
    // independent check of the REAL decoder, not a mirror of it.
    "x3_decoded_media" ->
      """SELECT file, format, width, height, channels, sample_rate,
           CAST(duration_ms AS DOUBLE) AS duration_ms,
           CAST(intensity AS DOUBLE) AS intensity
         FROM (VALUES
           ('gray.bmp',   'bmp', 6, 4, 3, 0,     0.0,   128.0/255),
           ('rgb.ppm',    'ppm', 3, 2, 3, 0,     0.0,   85.0/255),
           ('stereo.wav', 'wav', 0, 0, 2, 44100, 100.0, 0.0),
           ('tint.bmp',   'bmp', 4, 2, 3, 0,     0.0,   20.0/255),
           ('tone.wav',   'wav', 0, 0, 1, 8000,  250.0, 0.5))
         t(file, format, width, height, channels, sample_rate,
           duration_ms, intensity)
         ORDER BY file""",
    // Hand-derived planted values: NN 2× downsample keeps even rows/
    // cols of the canonical RGB raster. gray 6x4 uniform 128 -> 3x2 of
    // 128s; tint 4x2 uniform BGR(30,20,10) -> 2x1 of RGB(10,20,30)
    // (mean (10+20+30)/3 = 20); rgb.ppm rows [R,G,B] -> cols 0,2 of row
    // 0 = [R,B] (mean 510/6 = 85). md5s computed over those exact byte
    // streams.
    "x4_resized_media" ->
      """SELECT file, out_w, out_h,
           CAST(mean_intensity AS DOUBLE) AS mean_intensity, pix_md5
         FROM (VALUES
           ('gray.bmp', 3, 2, 128.0/255, '7bf2bbbf7f5ccc6bb19d3166288a231d'),
           ('rgb.ppm',  2, 1,  85.0/255, '0b6e96bfc7f6d594ea6f30a77482eccd'),
           ('tint.bmp', 2, 1,  20.0/255, '8c2ed4391169bcbc1c31000ce5dd2c74'))
         t(file, out_w, out_h, mean_intensity, pix_md5)
         ORDER BY file""",
    // tone.wav: 2000 samples @ 8 kHz mono = 250 ms -> five 50 ms frames
    // (400 samples each, alternating +/-16384 -> level 0.5); every 2nd
    // frame kept -> 0,2,4. stereo.wav: 4410 zero frames @ 44.1 kHz =
    // 100 ms -> two 50 ms frames -> frame 0 only, level 0.
    "x5_frame_sample" ->
      """SELECT file, frame_idx, CAST(frame_ms AS DOUBLE) AS frame_ms,
           CAST(level AS DOUBLE) AS level
         FROM (VALUES
           ('stereo.wav', 0, 50.0, 0.0),
           ('tone.wav',   0, 50.0, 0.5),
           ('tone.wav',   2, 50.0, 0.5),
           ('tone.wav',   4, 50.0, 0.5))
         t(file, frame_idx, frame_ms, level)
         ORDER BY file, frame_idx""",
    // x6: png row is ANALYTIC — PNG is lossless, so the decoded raster
    // equals tools/GenCompressedMedia's planted pixels: ΣRGB = 1400
    // over 24 bytes → (1400.0/24)/255 (identical IEEE ops both
    // engines), md5 = md5 of the planted top-down RGB stream (the
    // generator prints both; the engine's decode REPRODUCED them —
    // decoder-independent ground truth). jpg row is a HARVESTED golden
    // of the committed JDK ImageIO decode (lossy decode is
    // decoder-defined): QDump x6_compressed_media 2026-08-16, two
    // fresh-JVM runs byte-identical; re-harvest on a JDK change. The
    // planted JPEG's mean decoding to exactly 120/255 (the planted
    // per-channel average) is JPEG preserving the block DC term.
    "x6_compressed_media" ->
      """SELECT file, format, width, height,
           CAST(mean_intensity AS DOUBLE) AS mean_intensity, pix_md5
         FROM (VALUES
           ('jpg16x16.jpg', 'jpg', 16, 16, 0.47058823529411764,
            'd5516254bd0782927c6bb95404dd87bf'),
           ('png4x2.png',   'png', 4,  2,  (1400.0/24)/255,
            '8ef8577c73e8a098fd1c29d07aa221ec'))
         t(file, format, width, height, mean_intensity, pix_md5)
         ORDER BY file""",
    // media_type mirrors mediaTable's doc_id % 5 payload assignment
    // (files in name order: gray.bmp, rgb.ppm, stereo.wav, tint.bmp,
    // tone.wav — indices 2 and 4 are audio).
    "x2_meta_stats" ->
      """SELECT CASE WHEN CAST(doc_id % 5 AS INT) IN (2, 4) THEN 'audio'
                     ELSE 'image' END AS media_type,
         source AS src, CAST(COUNT(*) AS BIGINT) AS n,
         AVG(n_chars) AS avg_chars
         FROM documents WHERE n_chars > 200
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
