package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: decode a REAL media payload (uncompressed
  * 24-bpp BMP, binary PPM, PCM WAV — [[graft.operators.MediaDecode]])
  * into its feature struct, per row, inside whole-stage codegen.
  *
  * Why an Expression and not mapPartitions (SURVEY.md §7.3 preference
  * order): the decode is a pure scalar Array[Byte] => struct function, so
  * expressing it as an expression keeps the media-feature stage fused
  * with the surrounding projection/filter codegen — no Dataset encoder
  * boundary, no iterator serialization wall, and Catalyst remains free to
  * prune/push around it. The mapPartitions form (Multimodal
  * .extractFeatures) stays as the plug point for decoders that genuinely
  * need per-partition init (codec contexts, GPU batch inference); for a
  * pure-JVM decoder this expression is the hot-path shape.
  *
  * Undecodable payloads throw (MediaDecode's contract): a media pipeline
  * routes bad rows to quarantine explicitly, never silently zeroes them.
  */
case class MediaFeaturesOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary payload, got ${other.simpleString}")
  }

  override def dataType: DataType = MediaFeaturesOf.schema

  override def prettyName: String = "media_features"

  override protected def nullSafeEval(in: Any): Any =
    MediaFeaturesOf.decodeRow(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MediaFeaturesOf.decodeRow($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaFeaturesOf {

  /** Struct shape mirrors [[graft.operators.MediaDecode.Decoded]]:
    * format-appropriate fields, zeroed elsewhere (images have no sample
    * rate; audio has no geometry). */
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("intensity", DoubleType, nullable = false)))

  /** Static decode entry shared by eval and generated code. */
  def decodeRow(payload: Array[Byte]): InternalRow = {
    val d = graft.operators.MediaDecode.decode(payload)
    InternalRow(UTF8String.fromString(d.format), d.width, d.height,
      d.channels, d.sampleRate, d.durationMs, d.intensity)
  }
}
