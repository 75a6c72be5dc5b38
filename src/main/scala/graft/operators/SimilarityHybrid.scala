package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** Dense+sparse hybrid fusion (round-19 split, see
  * [[SimilarityBase]]): reciprocal-rank fusion s16 and its serving
  * tail. */
private[operators] trait SimilarityHybrid { this: Similarity.type =>

  /** RRF constant (Cormack et al.'s k=60 — the published default). */
  private[operators] val rrfK = 60

  /** The sparse-probe (qid, token) frame over a doc window — THE
    * query-token recipe for every sparse leg (s16 TF-IDF, s17/s19
    * BM25, s18's refresh window), one body so a probe-recipe change
    * (e.g. lowercasing) cannot desynchronize the legs — the
    * [[queryFrame]] rationale on the sparse side. Distinct tokens:
    * a repeated query token must not double-count a posting. */
  private[operators] def sparseQueryTokens(s: SparkSession, dir: String,
                                docWindow: Column): DataFrame =
    t(s, dir, "documents").filter(docWindow)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(queryTokenArray)).as("token"))

  /** The sparse (TF-IDF) top-k leg of [[s16HybridRrf]] — exposed so
    * the spec can compute the dense∩sparse intersection independently
    * of the fused output.
    *
    * Served off the ONE postings layout ([[rawPostingsFull]] +
    * [[fullTokenStats]] + [[fullCorpusCounts]] — the refresh-friendly
    * artifacts s17/s18 already serve from): idf6 =
    * round(ln(n_chunks/df)·10⁶) INTEGER micro-nats is realized AT
    * QUERY TIME on the broadcast query side (the [[bm25TopK]] qstats
    * pattern — the per-(qid, token) frame absorbs df and N, so the
    * corpus-sized postings artifact is touched exactly once, via the
    * broadcast token join), not baked into a second corpus-sized
    * artifact at build time. A dedicated idf6-baked postings table
    * existed through round 13 and was DELETED (round-13 verdict item
    * 5): it duplicated the raw postings row-for-row (8.7 s / 218 MB
    * redundant build at sf1) and its baked statistic made it
    * unmaintainable by the s18 fold. Arithmetic is unchanged — the
    * same log over the same double-cast counts, one rounding per
    * (token), then the exact integer sum Σ tf·idf6 — so the committed
    * s16 oracle (which recomputes idf relationally) gates this layout
    * verbatim. */
  private[graft] def s16SparseLeg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qtok = sparseQueryTokens(s, dir, col("doc_id") < s10QueryDocs)
    val wS = Window.partitionBy("qid")
      .orderBy(desc("ssc"), col("doc_id"), col("chunk_idx"))
    val qidf = fullTokenStats(s, dir).join(broadcast(qtok), Seq("token"))
      .crossJoin(broadcast(fullCorpusCounts(s, dir)))
      .withColumn("idf6",
        round(log(col("n_chunks").cast("double") / col("df")) * lit(1e6))
          .cast("long"))
      .select(col("qid"), col("token"), col("idf6"))
    rawPostingsFull(s, dir).join(broadcast(qidf), Seq("token"))
      .groupBy("qid", "doc_id", "chunk_idx")
      .agg(sum(col("tf") * col("idf6")).as("ssc"))
      .withColumn("sparse_rk", row_number().over(wS))
      .filter(col("sparse_rk") <= s10K)
      .select(col("qid"), col("doc_id"), col("chunk_idx"), col("sparse_rk"))
  }

  /** S16: HYBRID RETRIEVAL WITH RRF (round-12 verdict item 5) — the
    * standard production retrieval shape neither leg covers alone:
    * the DENSE leg is s10's serving path (persisted bucket-keyed
    * index, broadcast probes, exact rerank) and the SPARSE leg is a
    * TF-IDF inverted-index probe of the [[rawPostingsFull]] artifact
    * (t13's scoring domain at chunk granularity); reciprocal-rank
    * fusion (Σ 1/(k+rank), k=[[rrfK]]) merges the two top-k lists.
    * Fusion is pure rank arithmetic — the oracle recomputes it exactly
    * — and surfaces results either leg alone would miss-rank: lexical
    * matches the hash embedding cancels, semantic matches with no
    * token overlap.
    *
    * Scale shape: dense leg unchanged from s10 (corpus never
    * reshuffles per batch); sparse leg joins the postings artifact on
    * TOKEN against a broadcast query-token frame (batch×≤12 rows) —
    * candidate volume = Σ posting-list lengths of the query's tokens,
    * the classic inverted-index bound; fusion joins two
    * batch×[[s10K]]-row frames. Determinism: sparse scores are exact
    * integer sums (see [[s16SparseLeg]]); RRF terms are the same two
    * IEEE divisions + one add in both engines, rounded to 6 dp; all
    * ranks tie-break (doc_id, chunk_idx). */
  val s16HybridRrf: Q = (s, dir) =>
    rrfFuse(s10DenseLeg(s, dir), s16SparseLeg(s, dir))

  /** s10's serving top-k as a fusion leg — (qid, doc, chunk,
    * dense_rk); shared by [[s16HybridRrf]] and [[s19HybridBm25]]. */
  private[operators] def s10DenseLeg(s: SparkSession,
                                     dir: String): DataFrame =
    retrieveTopK(s10QueryFrame(s, dir), retrievalIndex(s, dir), planes,
      s10K)
      .select(col("qid"), col("doc_id"), col("chunk_idx"),
        col("rk").as("dense_rk"))

  /** Reciprocal-rank fusion of a dense and a sparse top-k leg —
    * Σ 1/(k+rank) with an absent leg contributing 0, 6-dp
    * rounded (the same two IEEE divisions + one add in both engines);
    * fused rank ties break (doc_id, chunk_idx). Pure rank arithmetic
    * over two batch×[[s10K]]-row frames — fusion cost is
    * corpus-independent regardless of what the legs scored. The k
    * constant defaults to the committed [[rrfK]] (both gates); it is a
    * parameter because its VALUE is a sensitivity dial, not part of
    * the fusion's contract — SimilaritySpec pins the k-invariant
    * properties (both-leg survival, both-leg rank dominance, plain-
    * Scala recompute) at k ∈ {10, 60, 240} so a retuned k cannot
    * silently change fusion semantics. */
  private[operators] def rrfFuse(dense: DataFrame, sparse: DataFrame,
                                 k: Int = rrfK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wF = Window.partitionBy("qid")
      .orderBy(desc("rrf"), col("doc_id"), col("chunk_idx"))
    dense.join(sparse, Seq("qid", "doc_id", "chunk_idx"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k) + col("dense_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("sparse_rk")), lit(0.0)), 6))
      .withColumn("rk", row_number().over(wF))
      .filter(col("rk") <= s10K)
      .select(col("qid"), col("rk"), col("doc_id"), col("chunk_idx"),
        col("rrf"), col("dense_rk"), col("sparse_rk"))
      .orderBy("qid", "rk")
  }

}
