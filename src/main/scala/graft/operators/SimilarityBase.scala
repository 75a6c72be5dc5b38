package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** Shared core of the Similarity family (round-19 split of the
  * 4,300-line Similarity.scala into reviewable units — VERDICT r18
  * item 6; behavior-free: every member is verbatim, the self-type
  * keeps all unqualified references resolving against the one
  * Similarity object, and the mixin order preserves the original
  * top-to-bottom initialization order): plane geometry + the
  * occupancy-targeted [[planesFor]] dial, portable vector helpers,
  * the sign-bucket encoder, and the multi-probe LSH ANN core s2/s5
  * share. */
private[operators] trait SimilarityBase { this: Similarity.type =>

  type Q = (SparkSession, String) => DataFrame

  private[operators] val dims = 64

  /** COMMITTED plane count for the gated queries (their DuckDB oracles
    * embed the same 2^6-bucket geometry). Production entry points take
    * the count as a parameter; [[planesFor]] derives it from corpus
    * size so per-bucket occupancy — and with it the candidate volume of
    * the s5 self-join — stays flat as n grows. */
  private[operators] val planes = 6

  /** Per-bucket occupancy [[planesFor]] aims for. Candidate volume of
    * the batch self-join is ≈ probes·occupancy per query vector, so the
    * target is the knob trading recall (bigger buckets) against cost. */
  private[operators] val targetOccupancy = 1024L

  /** Data-driven plane count: P = ⌈log2(n / targetOccupancy)⌉ clamped
    * to [1, 24] — doubling the corpus adds one plane, keeping expected
    * bucket occupancy (and s5's per-query candidate list) constant
    * instead of letting candidate volume grow quadratically at fixed P
    * (the d6TuneGeometry lesson applied to the ANN family; the s3
    * histogram is the skew check run against the CHOSEN P). At 10⁹
    * vectors: P = 20, ~10⁶ buckets, ~1k vectors each. */
  private[graft] def planesFor(n: Long,
                               occupancy: Long = targetOccupancy): Int = {
    require(n > 0 && occupancy > 0, s"bad tuner inputs n=$n occ=$occupancy")
    // ⌈log2(n/occ)⌉ clamped to [1,24], computed by the EXACT integer
    // rule (smallest p with occ·2^p ≥ n) rather than floating log2 —
    // a libm whose log double-rounds at an exact power of two would
    // otherwise recommend p+1 there and desynchronize the tuner from
    // prof8's committed CASE readout ([[planesForCaseSql]] is this
    // same rule as SQL text; SimilaritySpec pins the equivalence).
    (1 to 23).find(p => (occupancy << p) >= n).getOrElse(24)
  }

  /** [[planesFor]] as a pure-INTEGER SQL CASE chain over an n-valued
    * expression — smallest p in [1,24] with occupancy·2^p ≥ n, the
    * exact integer form of ⌈log2(n/occupancy)⌉ clamped to [1,24]
    * (2^p ≥ n/occ ⟺ occ·2^p ≥ n for integer n, occ). ONE generator
    * for the prof8 engine expression AND its DuckDB oracle: the
    * floating log2 form could double-round differently across libms
    * at exact powers of two; integer comparisons cannot.
    * (SimilaritySpec pins CASE ≡ planesFor across the clamp range.) */
  private[operators] def planesForCaseSql(
      nExpr: String, occupancy: Long = targetOccupancy): String = {
    val whens = (1 to 23).map(p =>
      s"WHEN ($nExpr) <= ${occupancy * (1L << p)} THEN $p").mkString(" ")
    s"(CASE $whens ELSE 24 END)"
  }

  /** Pseudo-random-but-portable plane component in [-1, 1]:
    * v(p, d) = (h60("pl<p>_<d>") % 2001 - 1000) / 1000.
    * Shared with Dedup's banded near-dup candidate generation (distinct
    * plane indices — s2/s10 use 0-5, s26's rebuild adds 6, Dedup bands
    * start at 10; allocate new planes from 7-9 or above the bands). */
  private[operators] def planeVal(p: Int, d: Int): Double = {
    // Mirrors Portable.h60 on literals; computed once at plan build.
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pl${p}_$d".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    ((h % 2001L) - 1000L) / 1000.0
  }

  // Flat codegen'd vector math — see functions.Vectors (interpreted
  // zip_with/aggregate dominates pairwise joins otherwise).
  private[operators] def dotD(a: Column, b: Column): Column = graft.functions.Vectors.dot(a, b)

  private[operators] def normD(a: Column): Column = graft.functions.Vectors.norm(a)

  /** Sign-bucket of a vector under the first `p` planes:
    * bit i = (dot(v, plane_i) > 0). Each dot is a native FloatVecDot
    * against a literal plane vector — a flat 64-term element_at sum
    * overflows codegen method limits and interprets (see plans
    * .FloatVecDot scaladoc). Fold order matches the oracle's explicit
    * left-associated term sum. */
  private[operators] def bucketOf(emb: Column, p: Int): Column =
    (0 until p).map { i =>
      val plane = typedlit((0 until dims).map(d => planeVal(i, d)))
      when(graft.functions.Vectors.dot(emb, plane) > 0, lit(1L << i))
        .otherwise(0L)
    }.reduce(_ + _)

  /** Shared multi-probe LSH ANN core — s2 (query subset) and s5 (batch
    * self-join) under an arbitrary plane count: bucket both sides by
    * the P-plane sign signature, explode each query to its own bucket
    * plus the P hamming-1 neighbors (sign flips near a hyperplane are
    * where true neighbors land), join on the bucket, exact cosine +
    * rank within the probed union. Candidates only ever come from
    * probed buckets, so the join is bucket-keyed — never all-pairs —
    * and with [[planesFor]] the per-query candidate list stays
    * ~probes·occupancy at any corpus size. */
  private[graft] def lshAnn(s: SparkSession, dir: String, p: Int,
                            queriesOnly: Boolean, k: Int): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"),
      bucketOf(col("embedding"), p).as("bkt"))
    val probeMasks = lit(0L) +: (0 until p).map(i => lit(1L << i))
    val qBase = if (queriesOnly) e.filter(col("vec_id") < 10) else e
    val q = qBase.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      col("nrm").as("qn"),
      explode(array(probeMasks.map(m => col("bkt").bitwiseXOR(m)): _*))
        .as("bkt"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("bkt"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    q.join(c, Seq("bkt")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

}
