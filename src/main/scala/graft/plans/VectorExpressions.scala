package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for float-vector dot products.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order): the
  * built-in alternatives both collapse on pairwise similarity joins —
  * `aggregate(zip_with(...))` is interpreted (~0.5µs/element → ~60s for
  * 2M pairs × 64 dims), and a flat 64-term `element_at` sum exceeds
  * codegen method limits and falls back to per-term interpreted eval
  * (slower still). This expression is a tight loop over the underlying
  * ArrayData in BOTH eval and generated code: ~100ns/pair.
  *
  * Semantics: double accumulation in array order, seeded at 0.0 — the
  * exact IEEE fold the DuckDB oracle computes via
  * `list_sum(list_transform(...))`, so results stay hash-identical.
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  // Literal plane vectors stay array<double> so IEEE results equal the
  // oracle's double arithmetic exactly (a float-cast plane would perturb
  // low-order bits and can flip a hyperplane sign near zero).
  private def isFloat(t: DataType): Boolean = elemType(t).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, isFloat(left.dataType))} * ${get(b, isFloat(right.dataType))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
