package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.SparkSpec

/** Multimodal plumbing: payload typing, metadata struct, batched
  * per-partition extraction determinism, and metadata-only pruning. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mediaTable: binary payload + typed metadata struct") {
    val mt = Multimodal.mediaTable(spark, dir)
    assert(mt.schema("payload").dataType === BinaryType)
    assert(mt.schema("meta").dataType.isInstanceOf[StructType])
    assert(mt.select("media_type").distinct().count() === 3)
  }

  test("extractFeatures: deterministic across batch sizes and runs") {
    val mt = Multimodal.mediaTable(spark, dir)
    val a = Multimodal.extractFeatures(mt, batchSize = 64)
      .orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(mt, batchSize = 7)
      .orderBy("doc_id").collect().toSeq
    assert(a === b) // batch shape must not affect results
    assert(a.nonEmpty)
    val row = a.head
    assert(row.getAs[String]("sig").length === 32)
    val bright = row.getAs[Double]("brightness")
    assert(bright >= 0.0 && bright <= 1.0)
  }

  test("expression path == batched-decoder path (and decoder is injectable)") {
    val mt = Multimodal.mediaTable(spark, dir)
    val viaMapPartitions = Multimodal.extractFeatures(mt)
      .orderBy("doc_id").collect().toSeq
    val viaExpressions = Multimodal.extractFeaturesExpr(mt)
      .orderBy("doc_id").collect().toSeq
    assert(viaMapPartitions === viaExpressions)
    // a custom decoder actually flows through the batched path
    val constant: Multimodal.Decoder = _ => ("x", 1, 2, 0.5)
    val custom = Multimodal.extractFeatures(mt, decoder = constant)
      .select("sig", "width", "height", "brightness").distinct().collect()
    assert(custom.length === 1)
    assert(custom.head.getString(0) === "x")
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
