package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the aggregation state of
  * [[ExactPercentile]]. Append-only until eval, which sorts in place.
  * Serialized form (partial→final shuffle / ObjectHashAggregate spill):
  * little-endian int size + packed doubles, no per-value boxing.
  */
final class DoublesBuf(private var a: Array[Double], private var sz: Int) {
  def this() = this(new Array[Double](16), 0)

  def size: Int = sz

  def add(v: Double): Unit = {
    if (sz == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
    a(sz) = v
    sz += 1
  }

  def addAll(o: DoublesBuf): Unit = {
    val need = sz + o.sz
    if (need > a.length) {
      var cap = math.max(a.length, 16)
      while (cap < need) cap <<= 1
      a = java.util.Arrays.copyOf(a, cap)
    }
    System.arraycopy(o.a, 0, a, sz, o.sz)
    sz = need
  }

  /** Interpolated percentile over the sorted values (sorts in place —
    * call only at eval). Rank rule pos = p·(n−1) with SYMMETRIC linear
    * interpolation lo·(1−f) + hi·f — the exact fp form DuckDB's
    * quantile_cont/median uses (verified empirically over random pairs;
    * the lerp form lo + (hi−lo)·f differs in the last ulp often enough
    * to flip 6-sig-fig canonicalization at .x5 boundaries, which is a
    * gate flake, not a math difference). */
  def percentile(p: Double): Double = {
    java.util.Arrays.sort(a, 0, sz)
    val pos = p * (sz - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) a(lo)
    else {
      val f = pos - lo
      a(lo) * (1.0 - f) + a(hi) * f
    }
  }

  def serialize(): Array[Byte] = {
    // 4 + 8*sz in Int arithmetic overflows negative at ~268M values and
    // allocate() would throw an unexplained IllegalArgumentException
    // mid-shuffle; fail with the remedy instead.
    require(sz <= (Int.MaxValue - 4) / 8,
      s"exact-percentile state too large ($sz values in one group); " +
        "use the approx percentile path for groups this size")
    val bb = ByteBuffer.allocate(4 + 8 * sz).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(sz)
    var i = 0
    while (i < sz) { bb.putDouble(a(i)); i += 1 }
    bb.array()
  }
}

object DoublesBuf {
  def deserialize(bytes: Array[Byte]): DoublesBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val a = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { a(i) = bb.getDouble; i += 1 }
    new DoublesBuf(a, n)
  }
}

/** Exact interpolated percentile as a native TypedImperativeAggregate —
  * the hot aggregate of the feature-store batteries (reference
  * sql/feature_store_drivers.sql:46-54: three median batteries per
  * window, A6). Spark's builtin `percentile` buffers a boxed
  * OpenHashMap[Number, Long] per (group × aggregate) and walks it through
  * generic rows; this buffers a primitive double array, serializes to
  * packed bytes, and sorts once at eval — same null-skipping, same
  * pos = p·(n−1) interpolation, bit-identical results (gated by the same
  * a6/fs oracles), measurably cheaper per row.
  *
  * Scale posture: state is one double per input row per group, merged
  * associatively map-side (partial aggregation) and spillable via
  * ObjectHashAggregate — the exact-percentile memory floor any engine
  * pays. The flagged approx path (functions.Agg) remains the
  * sketch-based alternative when that floor itself is too high.
  */
case class ExactPercentile(
    child: Expression,
    percentage: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoublesBuf]
  with UnaryLike[Expression] {

  require(percentage >= 0.0 && percentage <= 1.0,
    s"percentage must be in [0, 1], got $percentage")

  // AbstractDataType (ImplicitCastInputTypes) is private[sql]; callers
  // cast explicitly instead (functions.Agg wraps the child in a
  // double cast, as does the SQL builder)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_percentile requires DOUBLE input, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "exact_percentile"

  override def createAggregationBuffer(): DoublesBuf = new DoublesBuf()

  override def update(buf: DoublesBuf, input: InternalRow): DoublesBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoublesBuf, other: DoublesBuf): DoublesBuf = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: DoublesBuf): Any =
    if (buf.size == 0) null else buf.percentile(percentage)

  override def serialize(buf: DoublesBuf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): DoublesBuf =
    DoublesBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ExactPercentile =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): ExactPercentile =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildInternal(c: Expression): ExactPercentile =
    copy(child = c)
}
