package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native expressions for the portable-hash dedup pipeline
  * (functions.Portable / operators.Dedup). The math is IDENTICAL to the
  * SQL-built-in formulation the DuckDB oracle runs —
  *   h60(s)    = int64 of the first 15 hex chars of md5(s)
  *   shingle_j = (th_j*A + th_j+1*B + th_j+2*C) mod P  (per-term mod)
  *   mh_i      = min_j (hs_j * a_i + b_i) mod P
  *   simhash   = Σ_bit sign bits of per-bit ±1 sums over token hashes
  * — these nodes just evaluate it in tight loops over ArrayData instead
  * of per-element interpreted lambdas (transform/aggregate are not
  * codegen'd; measured ~3-5x on the signature stages).
  *
  * CodegenFallback is deliberate: the work is inside the loop in eval,
  * one virtual call per ROW — fallback overhead is irrelevant, and it
  * keeps md5 handling in JVM code rather than generated Java.
  */
object HashExpressions {
  /** h60 of a UTF-8 byte payload: first 60 bits of md5, non-negative. */
  def h60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    // first 15 hex chars = 7 bytes + high nibble of the 8th
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (md(i) & 0xffL); i += 1 }
    (v << 4) | ((md(7) & 0xf0L) >> 4)
  }
}

/** tokens: array<string> → array<long> of h60(token), reduced mod `p`
  * when p > 0 (p == 0 → raw 60-bit hashes, the SimHash input). */
case class H60Array(child: Expression, p: Long)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"h60_array requires array<string>, got ${t.simpleString}")
  }

  // containsNull: null elements pass through (null token → null hash),
  // matching the transform(...)-lambda semantics this node replaced.
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "h60_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.h60(arr.getUTF8String(i).getBytes)
        out(i) = if (p > 0) h % p else h
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** th: array<long> → array<long> of sliding 3-gram mixes
  * (th_j*a + th_j+1*b + th_j+2*c) mod p, per-term mod. Empty when
  * numElements < 3 (caller supplies the short-doc fallback). */
case class ShingleHashes(child: Expression, a: Long, b: Long, c: Long, p: Long)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val out = Array.newBuilder[Long]
    var j = 0
    while (j < n - 2) {
      // windows containing a null token hash are skipped (null-propagating
      // callers never produce one; defensive for external callers)
      if (!th.isNullAt(j) && !th.isNullAt(j + 1) && !th.isNullAt(j + 2)) {
        out += ((th.getLong(j) * a) % p + (th.getLong(j + 1) * b) % p +
          (th.getLong(j + 2) * c) % p) % p
      }
      j += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hs: array<long> → array<long>(k) MinHash signature:
  * mh_i = min_j (hs_j * a_i + b_i) mod p. NULL on empty input. */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)], p: Long)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val as = perms.map(_._1).toArray
  private val bs = perms.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * as(i) + bs(i)) % p
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (out(0) == Long.MaxValue) return null // all elements were null
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** th: array<long> of mod-P token hashes → array<double>(dims)
  * FEATURE-HASHING embedding (the "hashing trick"): each token adds
  * ±1.0 to dimension (h % dims), sign from the next hash bits
  * ((h / dims) % 2 == 0 → +1). Deterministic, vocabulary-free, and
  * SQL-expressible — the DuckDB oracle recomputes it with an
  * unnest/GROUP BY plan — which is why the retrieval-serving gate can
  * hash-match a learned-embedding-shaped pipeline end-to-end without a
  * model in the container (the s10 scaladoc owns the rationale).
  * Components are small-integer-valued doubles, so downstream dot
  * products are EXACT (no fp-summation-order exposure) until the final
  * norm/divide. Null token hashes contribute nothing. One tight O(n)
  * loop per row vs O(n·dims) for the transform/aggregate formulation. */
case class HashEmbed(child: Expression, dims: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if dims > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_embed requires array<long> and dims > 0, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val out = new Array[Double](dims)
    var j = 0
    while (j < n) {
      if (!th.isNullAt(j)) {
        val h = th.getLong(j)
        // floorMod/floorDiv: total over the declared array<long> input.
        // Every committed caller feeds mod-P (nonnegative) hashes, where
        // floor and truncated semantics coincide (and match the oracle's
        // `h % dims` / `(h // dims) % 2` on the same values) — but a
        // caller passing a negative hash must get a wrapped index, not
        // an ArrayIndexOutOfBoundsException (round-12 ADVICE).
        val d = java.lang.Math.floorMod(h, dims.toLong).toInt
        out(d) += (if (java.lang.Math.floorMod(
          java.lang.Math.floorDiv(h, dims.toLong), 2L) == 0L) 1.0 else -1.0)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** th: array<long> → 32-bit SimHash: bit j set iff Σ_tokens (±1 on
  * token-hash bit j) > 0. Zero for empty input. */
case class SimHash32(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val sums = new Array[Int](32)
    var j = 0
    while (j < n) {
      if (!th.isNullAt(j)) { // null token hashes contribute nothing
        val h = th.getLong(j)
        var bit = 0
        while (bit < 32) {
          if (((h >> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
          bit += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 32) {
      if (sums(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
