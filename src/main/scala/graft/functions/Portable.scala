package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * The driver's correctness gate re-runs every query in DuckDB
  * (tools/check_oracle.py), so any hash an operator depends on must compute
  * bit-identically in BOTH engines from SQL built-ins. Spark's `hash()`
  * (Murmur3) and DuckDB's `hash()` differ, so we derive a 60-bit integer
  * from the md5 hex digest — md5 is identical everywhere:
  *
  *   h60(s) = CAST(CONV(SUBSTR(MD5(s), 1, 15), 16, 10) AS BIGINT)   -- Spark
  *   h60(s) = CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT)         -- DuckDB
  *
  * 15 hex chars = 60 bits, always non-negative and inside int64, so modular
  * arithmetic below never overflows: for MinHash permutations
  * h_i(x) = (a_i * (h60(x) % P) + b_i) % P with P ≈ 1e9+7 the product stays
  * < 1e18 < 2^63.
  *
  * These are codegen'd built-ins (md5/conv/substring), no UDFs — the 100 TB
  * path stays inside whole-stage codegen.
  */
object Portable {

  /** Large prime modulus for MinHash permutations (< 2^30, so a*h+b < 2^63). */
  val P: Long = 1000000007L

  /** 60-bit portable hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same as [[h60]] but pre-reduced mod P for permutation arithmetic. */
  def h60p(c: Column): Column = h60(c) % P

  /** DuckDB SQL fragment equivalent to [[h60]] over expression `e`. */
  def h60Sql(e: String): String =
    s"CAST(('0x' || SUBSTR(MD5($e), 1, 15)) AS BIGINT)"

  /** DuckDB SQL fragment equivalent to [[h60p]]. */
  def h60pSql(e: String): String = s"(${h60Sql(e)} % $P)"

  /** Fixed MinHash permutation coefficients (a_i, b_i), i < 16.
    * Deterministic small odd constants; a_i coprime with P (P is prime, so
    * any a_i in (0, P) works). */
  val perms: Seq[(Long, Long)] = (1 to 16).map { i =>
    (2L * i * i * 1000003L + 12289L, 7L * i * 104729L + 104147L)
  }

  // ---- native batched forms (plans.HashExpressions) — same math as the
  // ---- SQL fragments above, evaluated in tight per-row loops.

  import org.apache.spark.sql.graftshim

  /** tokens → array of h60 hashes (mod P when modP, else raw 60-bit). */
  def h60Array(tokens: Column, modP: Boolean): Column =
    graftshim.column(graft.plans.H60Array(
      graftshim.expression(tokens), if (modP) P else 0L))

  /** token-hash array → sliding 3-gram shingle hashes (empty if < 3). */
  def shingleHashes(th: Column, a: Long, b: Long, c: Long): Column =
    graftshim.column(graft.plans.ShingleHashes(
      graftshim.expression(th), a, b, c, P))

  /** shingle-hash array → k-permutation MinHash signature. */
  def minhashSig(hs: Column, k: Int): Column =
    graftshim.column(graft.plans.MinHashSig(
      graftshim.expression(hs), perms.take(k), P))

  /** raw token-hash array → 32-bit SimHash. */
  def simhash32(th: Column): Column =
    graftshim.column(graft.plans.SimHash32(graftshim.expression(th)))

  /** mod-P token-hash array → dims-dimensional feature-hashing
    * embedding (±1 per token on dimension h % dims; plans.HashEmbed). */
  def hashEmbed(th: Column, dims: Int): Column =
    graftshim.column(graft.plans.HashEmbed(graftshim.expression(th), dims))

  /** |a ∩ b| of two SORTED DISTINCT long arrays (zero-allocation merge
    * loop; see plans.SortedIntersectCount for why not array_intersect). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    graftshim.column(graft.plans.SortedIntersectCount(
      graftshim.expression(a), graftshim.expression(b)))
}
