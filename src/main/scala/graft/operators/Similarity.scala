package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** Similarity search over the `embeddings` table (64-dim float vectors) —
  * SURVEY.md §7.4: exact brute-force cosine top-k as the baseline/oracle,
  * and a random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Scale posture:
  *  - s1 brute force is O(q·n) — correct and fine when the query set is
  *    small (it broadcasts); it is the verify oracle for s2's recall.
  *  - s2 buckets both sides by a P-plane sign signature, joins on the
  *    bucket (shuffle keyed by bucket, cardinality 2^P), and reranks
  *    exactly within buckets. At 100 TB: bucket count scales with P (and
  *    multi-probe on neighboring buckets raises recall) so per-bucket
  *    candidate lists stay executor-sized; the plane matrix is a literal
  *    (derived from Portable.h60), never collected or broadcast state.
  *  - dot products are higher-order array functions (zip_with/aggregate)
  *    with double accumulation in array order — bit-reproducible in the
  *    DuckDB oracle (list_transform/list_sum fold the same way).
  */
object Similarity
    extends SimilarityBase
    with SimilarityAnn
    with SimilarityRetrieval
    with SimilarityStoreLifecycle
    with SimilarityHybrid
    with SimilaritySparse
    with SimilarityOracles {

  // Round-19 mechanical split (VERDICT r18 item 6): the family's
  // members live in the six traits above — mixed in ORIGINAL file
  // order, so runtime initialization order is unchanged — and the
  // self-type on each keeps every cross-reference resolving against
  // this one object. The registry maps below are the public seam.

  val queries: Map[String, Q] = Map(
    "s1_cosine_topk" -> s1CosineTopK,
    "s2_lsh_ann" -> s2LshAnn,
    "s3_bucket_stats" -> s3BucketStats,
    "s4_ivf_ann" -> s4IvfAnn,
    "s5_knn_join" -> s5KnnJoin,
    "s6_sq8_ann" -> s6Sq8Ann,
    "s7_kmeans" -> s7Kmeans,
    "s8_semdedup" -> s8Semdedup,
    "s9_cluster_profile" -> s9ClusterProfile,
    "s10_retrieve" -> s10Retrieve,
    "s11_centroid_refresh" -> s11CentroidRefresh,
    "s12_pq_ann" -> s12PqAnn,
    "s13_ivfpq_ann" -> s13IvfpqAnn,
    "s14_multiprobe_ivfpq" -> s14MultiprobeIvfpq,
    "s15_index_refresh" -> s15IndexRefresh,
    "s16_hybrid_rrf" -> s16HybridRrf,
    "s17_bm25" -> s17Bm25,
    "s18_sparse_refresh" -> s18SparseRefresh,
    "s19_hybrid_bm25" -> s19HybridBm25,
    "s20_multiprobe_lsh" -> s20MultiprobeLsh,
    "s21_index_compaction" -> s21IndexCompaction,
    "s22_filtered_retrieve" -> s22FilteredRetrieve,
    "s24_index_delete" -> s24IndexDelete,
    "s25_banded_store" -> s25BandedStore,
    "s23_learned_embed" -> s23LearnedEmbed,
    "s26_rebucket_rebuild" -> s26RebucketRebuild,
    "s27_stream_delete" -> s27StreamDelete,
    "s28_learned_hybrid" -> s28LearnedHybrid,
    "s29_banded_rebucket" -> s29BandedRebucket,
    "s30_version_diff" -> s30VersionDiff,
    "s31_ann_recall" -> s31AnnRecall,
    "s32_post_event_recall" -> s32PostEventRecall,
    "prof7_embedding_drift" -> prof7EmbeddingDrift,
    "prof10_embedding_outliers" -> prof10EmbeddingOutliers,
    "prof8_index_health" -> prof8IndexHealth,
    "prof9_store_health" -> prof9StoreHealth,
  )

  // lazy: s10's oracle composes TextAnalysis.c3Sql — a plain val here
  // would force TextAnalysis during THIS object's init, and the d13
  // oracle already forces this object from Dedup's (init-cycle guard).
  lazy val oracle: Map[String, String] = Map(
    "s10_retrieve" -> s10Sql,
    "s11_centroid_refresh" -> s11Sql,
    "s12_pq_ann" -> s12Sql,
    "s13_ivfpq_ann" -> s13Sql,
    "s14_multiprobe_ivfpq" -> s14Sql,
    "s15_index_refresh" -> s15Sql,
    "s16_hybrid_rrf" -> s16Sql,
    "s17_bm25" -> s17Sql,
    "s18_sparse_refresh" -> s18Sql,
    "s19_hybrid_bm25" -> s19Sql,
    "s20_multiprobe_lsh" -> s20Sql,
    "s21_index_compaction" -> s15Sql,
    "s22_filtered_retrieve" -> s22Sql,
    "s24_index_delete" -> s24Sql,
    // s27 is s24's streaming arrival form: the tombstone fold is
    // batch-split invariant, so the one-shot delete oracle gates it
    // (the d12-reuses-d11 pattern on the delete dimension)
    "s27_stream_delete" -> s24Sql,
    // the banded layout must be invisible to results: s22's oracle
    // gates it verbatim (the s21/s15Sql sharing pattern)
    "s25_banded_store" -> s22Sql,
    "s23_learned_embed" -> s23Sql,
    "s28_learned_hybrid" -> s28Sql,
    // both dials of the one generator: s26's plane count + s25/s22's
    // quality predicate — the composition is oracled relationally
    "s29_banded_rebucket" -> s29Sql,
    "s30_version_diff" -> s30Sql,
    "s31_ann_recall" -> s31Sql,
    "s32_post_event_recall" -> s32Sql,
    "s26_rebucket_rebuild" -> s26Sql,
    "prof7_embedding_drift" -> prof7Sql,
    "prof10_embedding_outliers" -> prof10Sql,
    "prof8_index_health" -> prof8Sql,
    "prof9_store_health" -> prof9Sql,
    "s1_cosine_topk" -> s1Sql,
    "s2_lsh_ann" ->
      s"""WITH $normCte,
          eb AS (SELECT vec_id, embedding, nrm,
                   ${bucketSql("embedding")} AS bkt FROM e),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn,
                  xor(bkt, m.m) AS bkt
                FROM eb, (SELECT unnest($probeMasksSql) AS m) m
                WHERE vec_id < 10),
          c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn, bkt FROM eb),
          scored AS (
            SELECT qid, cid, $dotSql / (qn * cn) AS cosine
            FROM q JOIN c USING (bkt) WHERE qid <> cid),
          ranked AS (
            SELECT qid, cid, cosine,
              CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY cosine DESC, cid) AS INT) AS rk
            FROM scored)
          SELECT qid, cid, cosine, rk FROM ranked
          WHERE rk <= 3 ORDER BY qid, rk""",
    "s3_bucket_stats" ->
      s"""SELECT ${bucketSql("embedding")} AS bkt,
          CAST(count(*) AS BIGINT) AS n_vectors
          FROM embeddings GROUP BY 1 ORDER BY 1""",
    // Same bucketed join as the Spark side (DuckDB would take hours on
    // the naive n^2 form at sf0.1) — the recall-vs-exact check lives in
    // SimilaritySpec against s1's brute force on the query subset.
    "s5_knn_join" ->
      s"""WITH $normCte,
          eb AS (SELECT vec_id, embedding, nrm,
                   ${bucketSql("embedding")} AS bkt FROM e),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn,
                  xor(bkt, m.m) AS bkt
                FROM eb, (SELECT unnest($probeMasksSql) AS m) m),
          c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn, bkt FROM eb),
          scored AS (
            SELECT qid, cid, $dotSql / (qn * cn) AS cosine
            FROM q JOIN c USING (bkt) WHERE qid <> cid),
          ranked AS (
            SELECT qid, cid, cosine,
              CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY cosine DESC, cid) AS INT) AS rk
            FROM scored)
          SELECT qid, cid, cosine, rk FROM ranked
          WHERE rk <= 3 ORDER BY qid, rk""",
    "s6_sq8_ann" ->
      s"""WITH $normCte,
          en AS (
            SELECT vec_id, embedding, nrm,
              list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS nv
            FROM e),
          stats AS (
            SELECT r.i AS pos, min(nv[r.i]) AS mn, max(nv[r.i]) AS mx
            FROM en, range(1, 65) r(i) GROUP BY 1),
          q8 AS (
            SELECT en.vec_id, en.embedding, en.nrm,
              list(CASE WHEN s.mx > s.mn THEN
                  CAST(round(255.0 * (en.nv[s.pos] - s.mn)
                      / (s.mx - s.mn))
                    - round(255.0 * (0.0 - s.mn)
                      / (s.mx - s.mn)) AS BIGINT)
                ELSE 0 END ORDER BY s.pos) AS q
            FROM en, stats s
            GROUP BY en.vec_id, en.embedding, en.nrm),
          cand AS (
            SELECT qid, cid, qe, ce, qn, cn,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY qdot DESC, cid) AS crk
            FROM (
              SELECT q.vec_id AS qid, c.vec_id AS cid,
                q.embedding AS qe, c.embedding AS ce,
                q.nrm AS qn, c.nrm AS cn,
                list_sum(list_transform(range(1, 65),
                  i -> q.q[i] * c.q[i])) AS qdot
              FROM q8 q JOIN q8 c
                ON q.vec_id < 10 AND q.vec_id <> c.vec_id)),
          scored AS (
            SELECT qid, cid, $dotSql / (qn * cn) AS cosine
            FROM cand WHERE crk <= $sq8Candidates),
          ranked AS (
            SELECT qid, cid, cosine,
              CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY cosine DESC, cid) AS INT) AS rk
            FROM scored)
          SELECT qid, cid, cosine, rk FROM ranked
          WHERE rk <= 3 ORDER BY qid, rk""",
    "s4_ivf_ann" ->
      s"""WITH cent AS (
            SELECT label AS cell,
              list(c ORDER BY pos) AS centroid
            FROM (
              SELECT label, r.i AS pos,
                AVG(CAST(embedding[r.i] AS DOUBLE)) AS c
              FROM embeddings, range(1, 65) r(i)
              GROUP BY 1, 2)
            GROUP BY 1),
          $normCte,
          assigned AS (
            SELECT vec_id, embedding, nrm, cell FROM (
              SELECT e.vec_id, e.embedding, e.nrm, cent.cell,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                  list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * centroid[i])) DESC,
                  cent.cell) AS crk
              FROM e, cent) WHERE crk = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, cell
                FROM assigned WHERE vec_id < 10),
          c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn, cell
                FROM assigned),
          scored AS (
            SELECT qid, cid, $dotSql / (qn * cn) AS cosine
            FROM q JOIN c USING (cell) WHERE qid <> cid),
          ranked AS (
            SELECT qid, cid, cosine,
              CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY cosine DESC, cid) AS INT) AS rk
            FROM scored)
          SELECT qid, cid, cosine, rk FROM ranked
          WHERE rk <= 3 ORDER BY qid, rk""",
    "s7_kmeans" -> s7Sql,
    "s8_semdedup" -> s8Sql,
    "s9_cluster_profile" -> s9Sql,
  )
}
