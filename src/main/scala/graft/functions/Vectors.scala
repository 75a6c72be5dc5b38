package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, backed by the
  * native plans.FloatVecDot expression — Spark's higher-order functions
  * (zip_with/aggregate) are interpreted (~0.5µs/element: 2M pairs × 64
  * dims ≈ 60s) and a flat element_at sum blows codegen method limits.
  * FloatVecDot is a tight ArrayData loop in eval AND generated code with
  * the same IEEE fold order as the DuckDB oracle's list_sum.
  */
object Vectors {

  import org.apache.spark.sql.graftshim

  /** Testdata embedding dimension (embeddings.embedding: list<float>[64]). */
  val Dims = 64

  /** dot(a, b) with double accumulation in array order. */
  def dot(a: Column, b: Column): Column =
    graftshim.column(graft.plans.FloatVecDot(
      graftshim.expression(a), graftshim.expression(b)))

  /** L2 norm = sqrt(dot(a, a)). */
  def norm(a: Column): Column = sqrt(dot(a, a))
}
