package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** Arbitrary-number imputer — fills NULLs in the given columns with a
  * fixed value, as an `ml.Transformer` so it composes inside a Pipeline
  * exactly like the reference's feature-engine imputers
  * (reference scripts/05_ml_model.py:140-172: ArbitraryNumberImputer(99)
  * on sprint columns, (0) on sprint-gain columns — drivers with no sprint
  * history have NULL aggregates).
  *
  * Implementation is `na.fill` (pure Catalyst coalesce projection —
  * codegen'd, no shuffle, scale-free).
  */
class ArbitraryNumberImputer(override val uid: String) extends Transformer {

  def this() = this(Identifiable.randomUID("arbNumImputer"))

  final val fillValue: DoubleParam =
    new DoubleParam(this, "fillValue", "value substituted for NULL")
  final val inputCols: StringArrayParam =
    new StringArrayParam(this, "inputCols", "columns to impute")

  def setFillValue(v: Double): this.type = set(fillValue, v)
  def setInputCols(cs: Array[String]): this.type = set(inputCols, cs)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.na.fill($(fillValue), $(inputCols).toSeq)

  override def transformSchema(schema: StructType): StructType = {
    val missing = $(inputCols).filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"imputer columns not in schema: ${missing.mkString(",")}")
    schema
  }

  override def copy(extra: ParamMap): ArbitraryNumberImputer =
    defaultCopy(extra)
}
