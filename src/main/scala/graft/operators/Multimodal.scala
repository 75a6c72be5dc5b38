package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t

/** Multimodal-column plumbing (SURVEY.md §7.4): image/audio/video treated
  * as opaque `binary` payload columns with typed metadata structs, and a
  * batched per-partition decode / feature-extract stage.
  *
  * The DECODE ITSELF IS A STUB — image/audio codecs aren't in this
  * container (and decode is a leaf concern); `stubDecode` derives
  * deterministic fake (width, height, brightness) from the payload's md5
  * so the whole path is testable and oracle-checkable. Everything around
  * it is the real Spark plumbing a 100 TB media pipeline needs:
  *  - payloads as BinaryType columns (never strings — no charset damage);
  *  - metadata as a typed StructType travelling with the payload;
  *  - extraction has TWO paths: a codegen'd expression twin (the gated
  *    x1 — the stub's features are md5 built-ins) and mapPartitions over
  *    a typed Dataset in bounded BATCHES (batchSize=64) with an
  *    injectable Decoder — the exact shape a vectorized decoder (or GPU
  *    inference step) plugs into, one model/codec init per partition,
  *    not per row; mapPartitions is reserved for genuinely opaque
  *    decoders, never used where an expression fits;
  *  - decoded features land as plain columns, joinable/filterable
  *    downstream with full Catalyst pushdown on the metadata.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Raw media row: payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String,
                      payload: Array[Byte], src: String, n_chars: Long)

  /** Decoded features appended to the media identity. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           sig: String, width: Int, height: Int,
                           brightness: Double)

  /** Media table fixture: documents' text bytes as the opaque payload,
    * media_type round-robin, metadata struct alongside. At 100 TB the
    * payload column comes from the object store; nothing downstream
    * changes. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(col("source").as("src"), col("lang"),
        col("n_chars")).as("meta"))

  /** A decoder turns one payload into (sig, width, height, brightness) —
    * the plug point for a REAL image/audio codec or model. */
  type Decoder = Array[Byte] => (String, Int, Int, Double)

  /** ??? in spirit — STUB decoder: a real implementation decodes the
    * image/audio payload here (no codecs ship in this container). This
    * deterministic fake hashes the payload (md5) and derives
    * pseudo-dimensions so the batched path is testable end-to-end. */
  val stubDecode: Decoder = { payload =>
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hex = md.map("%02x".format(_)).mkString
    val width = java.lang.Integer.parseInt(hex.substring(0, 4), 16)
    val height = java.lang.Integer.parseInt(hex.substring(4, 8), 16)
    val brightness = java.lang.Long.parseLong(hex.substring(8, 12), 16) / 65535.0
    (hex, width, height, brightness)
  }

  /** Batched per-partition feature extraction — the mapPartitions shape a
    * vectorized decoder/GPU-inference step plugs into via `decoder` (init
    * once per partition, process in batches of `batchSize`). mapPartitions
    * is justified ONLY for opaque decoders; when the features are
    * expressible as Catalyst expressions use [[extractFeaturesExpr]]
    * (codegen'd, pushdown-friendly) — MultimodalSpec proves the two paths
    * agree for the stub. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      decoder: Decoder = stubDecode): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"),
      col("meta.src").as("src"), col("meta.n_chars").as("n_chars"))
      .as[MediaRow]
      .mapPartitions { it =>
        // init per partition (codec/model handle would be created here)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (hex, w, h, b) = decoder(r.payload)
            MediaFeatures(r.doc_id, r.media_type, r.payload.length, hex, w, h, b)
          }
        }
      }
      .toDF()
  }

  /** Native-expression twin of [[extractFeatures]]+[[stubDecode]]: the
    * stub's md5-derived features are all built-ins (md5/substring/conv/
    * length), so the GATED x1 path stays inside whole-stage codegen — no
    * mapPartitions serialization wall on the hot path. */
  def extractFeaturesExpr(media: DataFrame): DataFrame = {
    val sig = md5(col("payload"))
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).as("n_bytes"),
      sig.as("sig"),
      conv(substring(sig, 1, 4), 16, 10).cast("int").as("width"),
      conv(substring(sig, 5, 4), 16, 10).cast("int").as("height"),
      (conv(substring(sig, 9, 4), 16, 10).cast("long") / 65535.0)
        .as("brightness"))
  }

  /** X1: end-to-end media feature extraction (payload → decode →
    * feature columns) via the codegen'd expression path; oracle-checked
    * because the stub features are md5-derived. */
  val x1MediaFeatures: Q = (s, dir) =>
    extractFeaturesExpr(mediaTable(s, dir))
      .orderBy("doc_id")

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
  )

  val oracle: Map[String, String] = Map(
    "x1_media_features" ->
      """SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
         md5(text) AS sig,
         CAST(('0x' || substr(md5(text), 1, 4)) AS INT) AS width,
         CAST(('0x' || substr(md5(text), 5, 4)) AS INT) AS height,
         CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) / 65535.0 AS brightness
         FROM documents ORDER BY doc_id""",
    "x2_meta_stats" ->
      """SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         source AS src, CAST(COUNT(*) AS BIGINT) AS n,
         AVG(n_chars) AS avg_chars
         FROM documents WHERE n_chars > 200
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
