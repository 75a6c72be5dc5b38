package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the aggregation state of
  * [[ExactPercentile]]. Two self-selecting modes:
  *
  *  - APPEND (batch GroupBy): append-only until eval, which sorts in
  *    place — O(1)/row, one O(n log n) sort. The hot fs-battery path
  *    keeps its tight primitive-array profile, unchanged.
  *  - HEAP (window running frame): WindowExec's UNBOUNDED PRECEDING
  *    frame interleaves eval → add → eval …; the first add AFTER an
  *    eval flips the buffer into a p-balanced two-heap (max-heap of the
  *    smallest ⌊p·(n−1)⌋+1 values, min-heap of the rest), giving
  *    O(log k) adds and O(1) evals — O(n log n) per partition for the
  *    running median instead of the per-row re-sort's O(n² log n).
  *    The flip itself is O(k): the eval just sorted the array, and a
  *    descending (ascending) slice of a sorted array IS a valid
  *    max-heap (min-heap).
  *
  * Both modes select identical order statistics (same multiset ranks;
  * heap comparisons and Arrays.sort only diverge on NaN / signed-zero
  * inputs, which the gated numeric columns exclude) and share the
  * DuckDB-matched interpolation in [[interp]].
  *
  * Serialized form (partial→final shuffle / ObjectHashAggregate spill —
  * batch path only; window frames never serialize mid-frame):
  * little-endian int size + packed doubles, no per-value boxing.
  */
final class DoublesBuf(private var a: Array[Double], private var sz: Int) {
  def this() = this(new Array[Double](16), 0)

  private var evaluated = false // a percentile() ran; next add flips mode
  private var hp = -1.0         // the p the heap balance tracks
  private var heapMode = false
  private var lo: Array[Double] = null // max-heap: smallest ⌊p(n−1)⌋+1
  private var nLo = 0
  private var hi: Array[Double] = null // min-heap: the rest
  private var nHi = 0

  def size: Int = sz

  def add(v: Double): Unit = {
    if (!heapMode && evaluated) toHeaps()
    if (heapMode) {
      sz += 1
      if (nLo == 0 || v <= lo(0)) pushLo(v) else pushHi(v)
      rebalance()
    } else {
      if (sz == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(sz) = v
      sz += 1
    }
  }

  def addAll(o: DoublesBuf): Unit = {
    if (heapMode || o.heapMode) { // merge-after-eval: degenerate, stay correct
      o.foreachValue(add)
      return
    }
    val need = sz + o.sz
    if (need > a.length) {
      var cap = math.max(a.length, 16)
      while (cap < need) cap <<= 1
      a = java.util.Arrays.copyOf(a, cap)
    }
    System.arraycopy(o.a, 0, a, sz, o.sz)
    sz = need
  }

  private def foreachValue(f: Double => Unit): Unit =
    if (heapMode) {
      var i = 0
      while (i < nLo) { f(lo(i)); i += 1 }
      i = 0
      while (i < nHi) { f(hi(i)); i += 1 }
    } else {
      var i = 0
      while (i < sz) { f(a(i)); i += 1 }
    }

  /** Interpolated percentile. Rank rule pos = p·(n−1) with SYMMETRIC
    * linear interpolation lo·(1−f) + hi·f — the exact fp form DuckDB's
    * quantile_cont/median uses (verified empirically over random pairs;
    * the lerp form lo + (hi−lo)·f differs in the last ulp often enough
    * to flip 6-sig-fig canonicalization at .x5 boundaries, which is a
    * gate flake, not a math difference). APPEND mode sorts in place
    * (call only at eval); HEAP mode reads the two heap tops. */
  def percentile(p: Double): Double = {
    if (heapMode) {
      if (p != hp) { flatten(); return percentile(p) } // never in practice
      val pos = p * (sz - 1)
      val loIdx = math.floor(pos).toInt
      val hiIdx = math.ceil(pos).toInt
      // rebalance() keeps nLo == loIdx+1, so lo(0) is rank loIdx and
      // hi(0) is rank loIdx+1
      if (loIdx == hiIdx) lo(0)
      else {
        val f = pos - loIdx
        lo(0) * (1.0 - f) + hi(0) * f
      }
    } else {
      java.util.Arrays.sort(a, 0, sz)
      evaluated = true
      hp = p
      val pos = p * (sz - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) a(lo)
      else {
        val f = pos - lo
        a(lo) * (1.0 - f) + a(hi) * f
      }
    }
  }

  /** APPEND → HEAP flip. Precondition: percentile() just ran, so `a`
    * is sorted ascending; its reversed prefix is a valid max-heap and
    * its suffix a valid min-heap as-is (parent index < child index). */
  private def toHeaps(): Unit = {
    val t = math.floor(hp * (sz - 1)).toInt + 1
    nLo = t
    lo = new Array[Double](t + 16)
    var i = 0
    while (i < t) { lo(i) = a(t - 1 - i); i += 1 }
    nHi = sz - t
    hi = new Array[Double](nHi + 16)
    i = 0
    while (i < nHi) { hi(i) = a(t + i); i += 1 }
    a = null
    heapMode = true
  }

  /** HEAP → APPEND flip (only for a p-change mid-stream, which no real
    * plan produces — one Expression instance has one fixed p). */
  private def flatten(): Unit = {
    val arr = new Array[Double](math.max(sz, 16))
    var i = 0
    foreachValue { v => arr(i) = v; i += 1 }
    a = arr
    heapMode = false
    evaluated = false
    lo = null; hi = null; nLo = 0; nHi = 0
  }

  /** Restore nLo == ⌊p·(sz−1)⌋+1 — moves at most one value per add. */
  private def rebalance(): Unit = {
    val t = math.floor(hp * (sz - 1)).toInt + 1
    while (nLo > t) pushHi(popLo())
    while (nLo < t) pushLo(popHi())
  }

  private def pushLo(v: Double): Unit = {
    if (nLo == lo.length)
      lo = java.util.Arrays.copyOf(lo, lo.length << 1)
    var i = nLo
    lo(i) = v
    nLo += 1
    while (i > 0 && lo((i - 1) >> 1) < lo(i)) {
      val p = (i - 1) >> 1
      val tmp = lo(p); lo(p) = lo(i); lo(i) = tmp
      i = p
    }
  }

  private def popLo(): Double = {
    val top = lo(0)
    nLo -= 1
    lo(0) = lo(nLo)
    var i = 0
    var done = false
    while (!done) {
      val l = (i << 1) + 1
      val r = l + 1
      var m = i
      if (l < nLo && lo(l) > lo(m)) m = l
      if (r < nLo && lo(r) > lo(m)) m = r
      if (m == i) done = true
      else {
        val tmp = lo(m); lo(m) = lo(i); lo(i) = tmp
        i = m
      }
    }
    top
  }

  private def pushHi(v: Double): Unit = {
    if (nHi == hi.length)
      hi = java.util.Arrays.copyOf(hi, hi.length << 1)
    var i = nHi
    hi(i) = v
    nHi += 1
    while (i > 0 && hi((i - 1) >> 1) > hi(i)) {
      val p = (i - 1) >> 1
      val tmp = hi(p); hi(p) = hi(i); hi(i) = tmp
      i = p
    }
  }

  private def popHi(): Double = {
    val top = hi(0)
    nHi -= 1
    hi(0) = hi(nHi)
    var i = 0
    var done = false
    while (!done) {
      val l = (i << 1) + 1
      val r = l + 1
      var m = i
      if (l < nHi && hi(l) < hi(m)) m = l
      if (r < nHi && hi(r) < hi(m)) m = r
      if (m == i) done = true
      else {
        val tmp = hi(m); hi(m) = hi(i); hi(i) = tmp
        i = m
      }
    }
    top
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
    foreachValue(bb.putDouble(_))
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
