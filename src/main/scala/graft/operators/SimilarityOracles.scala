package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** DuckDB oracle SQL of the whole Similarity family (round-19 split,
  * see [[SimilarityBase]]): every fragment and per-entry dual, kept in
  * one unit so shared CTE text (cidx, postings, lloyd chains) cannot
  * drift apart across the serving/lifecycle seams. */
private[operators] trait SimilarityOracles { this: Similarity.type =>

  /** DuckDB fragment: bucket id of `e.embedding` under `nPlanes` sign
    * planes (default: the committed geometry) — the SAME planeVal
    * constants the engine's bucketOf folds, so a geometry change can't
    * desynchronize the two sides (s26 dials nPlanes up by one). */
  private[operators] def bucketSql(emb: String, nPlanes: Int = planes): String =
    (0 until nPlanes).map { p =>
      val terms = (0 until dims).map(d =>
        s"CAST($emb[${d + 1}] AS DOUBLE) * (${planeVal(p, d)})")
        .mkString(" + ")
      s"CASE WHEN ($terms) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  private[operators] val dotSql =
    "list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))"

  /** Multi-probe mask list derived from the SAME [[probeMasks]]
    * generator (and `planes` constant) the Spark side folds over — a
    * literal list here would silently desynchronize engine and oracle
    * if the committed geometry or radius set changed. */
  private[operators] def probeMasksSqlFor(radius: Int, nPlanes: Int = planes): String =
    probeMasks(nPlanes, radius).mkString("[", ", ", "]")

  private[operators] val probeMasksSql: String = probeMasksSqlFor(1)

  private[operators] val normCte =
    """e AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings)"""

  // s7 oracle building blocks: one assignment CTE (argmin by the SAME
  // |c|^2 - 2*v.c formula and fold order the Spark side computes, ties
  // by cell) and one recompute CTE (per-dim AVG, list re-assembled in
  // pos order — the s4 pattern), chained kmeansIters times.
  private[operators] def kmeansAssignSql(centCte: String, out: String,
                              src: String = "e"): String =
    s"""$out AS (
        SELECT vec_id, embedding, cell, d FROM (
          SELECT vec_id, embedding, cell, d,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cell)
              AS rk
          FROM (
            SELECT e.vec_id, e.embedding, c.cell,
              list_sum(list_transform(range(1, ${dims + 1}),
                i -> c.vec[i] * c.vec[i]))
              - 2 * list_sum(list_transform(range(1, ${dims + 1}),
                  i -> CAST(e.embedding[i] AS DOUBLE) * c.vec[i])) AS d
            FROM $src e, $centCte c))
        WHERE rk = 1)"""

  private[operators] def kmeansRecomputeSql(assignCte: String, out: String): String =
    s"""$out AS (
        SELECT cell, list(c ORDER BY pos) AS vec FROM (
          SELECT cell, r.i AS pos,
            round(AVG(CAST(embedding[r.i] AS DOUBLE)), 6) AS c
          FROM $assignCte, range(1, ${dims + 1}) r(i) GROUP BY 1, 2)
        GROUP BY 1)"""

  /** The full Lloyd chain as CTEs ending in `af` (vec_id, embedding,
    * cell, d — the FINAL assignment under the final centroids
    * c$kmeansIters), parameterized by a WHERE clause on the embeddings
    * scan and the init ids ([[lloyd]]'s SQL twin): shared by the s7/s8/
    * s9 oracles and d13's cluster-tag oracle (full corpus, init
    * 0..K-1) and the s11 refresh oracle (base slice, lowest K base
    * ids). */
  private[operators] def lloydChainCtes(where: String,
                                        initIds: Seq[Long]): String = {
    val iterCtes = (1 to kmeansIters).map { it =>
      kmeansAssignSql(s"c${it - 1}", s"a$it") + ",\n" +
        kmeansRecomputeSql(s"a$it", s"c$it")
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings $where),
        c0 AS (
          SELECT CAST(vec_id AS INT) AS cell,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          FROM e WHERE vec_id IN (${initIds.mkString(", ")})),
        $iterCtes,
        ${kmeansAssignSql(s"c$kmeansIters", "af")}"""
  }

  private[operators] lazy val s7ChainCtes: String =
    lloydChainCtes("", 0L until kmeansK.toLong)

  // s12 oracle building blocks: the s7 Lloyd chain re-derived per PQ
  // subspace (16-dim slices, CTE names suffixed by subspace), the
  // final-codebook encode pass, per-query ADC distance tables, and the
  // explicit left-associated d0+d1+d2+d3 candidate sum — relational
  // end-to-end, independent of the Spark artifacts.
  private[operators] def pqSubCte(m: Int): String = {
    val lo = m * pqSubDims + 1
    val hi = (m + 1) * pqSubDims
    s"""em$m AS (
        SELECT vec_id,
          list_transform(embedding[$lo:$hi], x -> CAST(x AS DOUBLE)) AS sub
        FROM embeddings)"""
  }

  private[operators] def pqAssignCte(m: Int, centCte: String, out: String): String =
    s"""$out AS (
        SELECT vec_id, sub, cell, d FROM (
          SELECT vec_id, sub, cell, d,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cell)
              AS rk
          FROM (
            SELECT ee.vec_id, ee.sub, c.cell,
              list_sum(list_transform(range(1, ${pqSubDims + 1}),
                i -> c.vec[i] * c.vec[i]))
              - 2 * list_sum(list_transform(range(1, ${pqSubDims + 1}),
                  i -> ee.sub[i] * c.vec[i])) AS d
            FROM em$m ee, $centCte c))
        WHERE rk = 1)"""

  private[operators] def pqRecomputeCte(assignCte: String, out: String): String =
    s"""$out AS (
        SELECT cell, list(c ORDER BY pos) AS vec FROM (
          SELECT cell, r.i AS pos, round(AVG(sub[r.i]), 6) AS c
          FROM $assignCte, range(1, ${pqSubDims + 1}) r(i) GROUP BY 1, 2)
        GROUP BY 1)"""

  /** Per-subspace chain ending in `enc\$m` (the final-codebook encode)
    * and `dt\$m` (the query-side ADC distance table). */
  private[operators] def pqChainCtes(m: Int): String = {
    val iters = (1 to kmeansIters).map { it =>
      pqAssignCte(m, s"cb$m${it - 1}", s"a$m$it") + ",\n" +
        pqRecomputeCte(s"a$m$it", s"cb$m$it")
    }.mkString(",\n")
    s"""${pqSubCte(m)},
        cb${m}0 AS (
          SELECT CAST(vec_id AS INT) AS cell, sub AS vec
          FROM em$m WHERE vec_id IN (${(0 until pqK).mkString(", ")})),
        $iters,
        ${pqAssignCte(m, s"cb$m$kmeansIters", s"enc$m")},
        dt$m AS (
          SELECT qq.vec_id AS qid, c.cell,
            list_sum(list_transform(range(1, ${pqSubDims + 1}),
              i -> c.vec[i] * c.vec[i]))
            - 2 * list_sum(list_transform(range(1, ${pqSubDims + 1}),
                i -> qq.sub[i] * c.vec[i])) AS d
          FROM em$m qq, cb$m$kmeansIters c WHERE qq.vec_id < 10)"""
  }

  private[operators] lazy val s12Sql: String = {
    val chains = (0 until pqM).map(pqChainCtes).mkString(",\n")
    val encJoin = (1 until pqM)
      .map(m => s"JOIN enc$m e$m USING (vec_id)").mkString(" ")
    val codeCols = (0 until pqM).map(m => s"e$m.cell AS c$m").mkString(", ")
    val dtJoins = (0 until pqM).map(m =>
      s"JOIN dt$m d$m ON d$m.qid = q.qid AND d$m.cell = en.c$m")
      .mkString("\n          ")
    val adist = (0 until pqM).map(m => s"d$m.d").mkString(" + ")
    s"""WITH $chains,
        $normCte,
        enc AS (
          SELECT e0.vec_id, $codeCols
          FROM enc0 e0 $encJoin),
        q AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10),
        cand AS (
          SELECT q.qid, en.vec_id AS cid, $adist AS adist
          FROM q JOIN enc en ON en.vec_id <> q.qid
          $dtJoins),
        top AS (
          SELECT qid, cid,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist ASC, cid)
              AS crk
          FROM cand),
        rr AS (
          SELECT t.qid, t.cid, a.embedding AS qe, b.embedding AS ce,
            a.nrm AS qn, b.nrm AS cn
          FROM top t JOIN e a ON a.vec_id = t.qid
            JOIN e b ON b.vec_id = t.cid
          WHERE t.crk <= $pqCandidates),
        scored AS (SELECT qid, cid, $dotSql / (qn * cn) AS cosine FROM rr),
        ranked AS (
          SELECT qid, cid, cosine,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, cid) AS INT) AS rk
          FROM scored)
        SELECT qid, cid, cosine, rk FROM ranked
        WHERE rk <= 3 ORDER BY qid, rk"""
  }

  /** prof7 oracle: the s11 base-slice Lloyd chain (af = base assigned
    * under the final base centroids), the arrival slice assigned under
    * the same model, then the prof6 PSI formula over the k-row
    * occupancy frame — same eps floor, same 6-dp rounding. */
  private[operators] lazy val prof7Sql: String = {
    val eps = graft.queries.Profile.driftEps
    s"""WITH ${lloydChainCtes(s"WHERE vec_id % $s11Mod != $s11Res",
          s11InitIds)},
        bb AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % $s11Mod = $s11Res),
        ${kmeansAssignSql(s"c$kmeansIters", "ba", "bb")},
        cr AS (SELECT cell AS cluster, CAST(count(*) AS BIGINT) AS n_ref
               FROM af GROUP BY 1),
        cc AS (SELECT cell AS cluster, CAST(count(*) AS BIGINT) AS n_cur
               FROM ba GROUP BY 1),
        occ AS (
          SELECT COALESCE(cr.cluster, cc.cluster) AS cluster,
            COALESCE(cr.n_ref, 0) AS n_ref, COALESCE(cc.n_cur, 0) AS n_cur
          FROM cr FULL JOIN cc ON cr.cluster = cc.cluster),
        tt AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS ref_tot,
                      CAST(sum(n_cur) AS DOUBLE) AS cur_tot FROM occ),
        terms AS (
          SELECT cluster, n_ref, n_cur,
            n_ref / ref_tot AS rs, n_cur / cur_tot AS cs,
            greatest(n_ref / ref_tot, $eps) AS p,
            greatest(n_cur / cur_tot, $eps) AS q
          FROM occ, tt),
        t2 AS (SELECT *, (q - p) * ln(q / p) AS term FROM terms),
        ps AS (SELECT round(sum(term), 6) AS psi FROM t2)
        SELECT cluster, n_ref, n_cur, round(rs, 6) AS ref_share,
          round(cs, 6) AS cur_share, round(term, 6) AS psi_term, ps.psi
        FROM t2, ps ORDER BY cluster"""
  }

  /** PROF10 oracle: the same 6-dp-rounded centroid, the same expansion
    * algebra, the same list_sum fold order. */
  private[operators] lazy val prof10Sql: String =
    s"""WITH cent AS (
          SELECT list(c ORDER BY pos) AS vec FROM (
            SELECT r.i AS pos,
              round(AVG(CAST(embedding[r.i] AS DOUBLE)), 6) AS c
            FROM embeddings, range(1, ${dims + 1}) r(i) GROUP BY 1)),
        d AS (
          SELECT e.vec_id,
            sqrt(greatest(
              list_sum(list_transform(range(1, ${dims + 1}),
                i -> c.vec[i] * c.vec[i]))
              - 2 * list_sum(list_transform(range(1, ${dims + 1}),
                  i -> CAST(e.embedding[i] AS DOUBLE) * c.vec[i]))
              + list_sum(list_transform(range(1, ${dims + 1}),
                  i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE))), 0)) AS dist
          FROM embeddings e, cent c),
        st AS (SELECT avg(dist) AS mu, stddev_samp(dist) AS sd FROM d)
        SELECT d.vec_id, round(d.dist, 6) AS l2_dist,
          round((d.dist - st.mu) / st.sd, 6) AS z
        FROM d, st ORDER BY d.vec_id"""

  /** Parameterized s13/s14 oracle (the SQL twin of [[ivfpqAnn]]):
    * the s7 coarse chain + the four PQ subspace chains, with the
    * candidate restriction set by the `qprobe` CTE — each query ranked
    * against the final centroids by the same |c|²−2·q·c distance and
    * (d, cell) tie order the assignment uses, kept to the `probes`
    * nearest cells. prk=1 is the query's own cell, so probes=1 IS the
    * single-probe s13 semantics; one generator keeps both oracles and
    * both engine paths on a single contract (round-13 review). */
  private[operators] def ivfpqSqlFor(probes: Int): String = {
    val chains = (0 until pqM).map(pqChainCtes).mkString(",\n")
    val encJoin = (1 until pqM)
      .map(m => s"JOIN enc$m e$m USING (vec_id)").mkString(" ")
    val codeCols = (0 until pqM).map(m => s"e$m.cell AS c$m").mkString(", ")
    val encxCols = (0 until pqM).map(m => s"x.c$m").mkString(", ")
    val dtJoins = (0 until pqM).map(m =>
      s"JOIN dt$m d$m ON d$m.qid = q.vec_id AND d$m.cell = en.c$m")
      .mkString("\n          ")
    val adist = (0 until pqM).map(m => s"d$m.d").mkString(" + ")
    s"""WITH $s7ChainCtes,
        $chains,
        nn AS (
          SELECT vec_id, embedding, cell AS coarse,
            sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM af),
        encx AS (
          SELECT e0.vec_id, $codeCols
          FROM enc0 e0 $encJoin),
        qprobe AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cell)
                AS prk
            FROM (
              SELECT qq.vec_id, c.cell,
                list_sum(list_transform(range(1, ${dims + 1}),
                  i -> c.vec[i] * c.vec[i]))
                - 2 * list_sum(list_transform(range(1, ${dims + 1}),
                    i -> CAST(qq.embedding[i] AS DOUBLE) * c.vec[i])) AS d
              FROM (SELECT vec_id, embedding FROM nn WHERE vec_id < 10) qq,
                c$kmeansIters c))
          WHERE prk <= $probes),
        cand AS (
          SELECT q.vec_id AS qid, en.vec_id AS cid, $adist AS adist
          FROM qprobe q
          JOIN (SELECT x.vec_id, n.coarse, $encxCols
                FROM encx x JOIN nn n USING (vec_id)) en
            ON en.coarse = q.cell AND en.vec_id <> q.vec_id
          $dtJoins),
        top AS (
          SELECT qid, cid,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist ASC, cid)
              AS crk
          FROM cand),
        rr AS (
          SELECT t.qid, t.cid, a.embedding AS qe, b.embedding AS ce,
            a.nrm AS qn, b.nrm AS cn
          FROM top t JOIN nn a ON a.vec_id = t.qid
            JOIN nn b ON b.vec_id = t.cid
          WHERE t.crk <= $pqCandidates),
        scored AS (SELECT qid, cid, $dotSql / (qn * cn) AS cosine FROM rr),
        ranked AS (
          SELECT qid, cid, cosine,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, cid) AS INT) AS rk
          FROM scored)
        SELECT qid, cid, cosine, rk FROM ranked
        WHERE rk <= 3 ORDER BY qid, rk"""
  }

  private[operators] lazy val s13Sql: String = ivfpqSqlFor(1)
  private[operators] lazy val s14Sql: String = ivfpqSqlFor(ivfProbes)

  /** S1 oracle (named so [[s31Sql]] can compose it as the ground-truth
    * leg): exact all-pairs cosine top-5 over the query subset. */
  private[operators] lazy val s1Sql: String =
    s"""WITH $normCte,
        q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e
              WHERE vec_id < 10),
        c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM e),
        scored AS (
          SELECT qid, cid, $dotSql / (qn * cn) AS cosine
          FROM q JOIN c ON qid <> cid),
        ranked AS (
          SELECT qid, cid, cosine,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, cid) AS INT) AS rk
          FROM scored)
        SELECT qid, cid, cosine, rk FROM ranked
        WHERE rk <= 5 ORDER BY qid, rk"""

  /** S31 oracle: the three legs' own SQL contracts composed — exact
    * top-3 from [[s1Sql]], each ANN variant from its parameterized
    * generator, recall as the per-qid semi-join count over 3. */
  private[operators] lazy val s31Sql: String = {
    def leg(name: String, sql: String): String =
      s"""SELECT '$name' AS variant, q.qid,
            CAST(count(a.cid) AS BIGINT) AS n_hits
          FROM (SELECT DISTINCT qid FROM exact) q
          LEFT JOIN (
            SELECT x.qid, x.cid FROM (SELECT qid, cid FROM ($sql)) x
            JOIN exact e ON e.qid = x.qid AND e.cid = x.cid) a
            ON a.qid = q.qid
          GROUP BY q.qid"""
    s"""WITH exact AS (
          SELECT qid, cid FROM ($s1Sql) WHERE rk <= $s31K),
        hits AS (${leg("ivfpq_p1", s13Sql)}
          UNION ALL ${leg(s"ivfpq_p$ivfProbes", s14Sql)}),
        rec AS (
          SELECT variant, qid, n_hits,
            round(CAST(n_hits AS DOUBLE) / $s31K, 6) AS recall
          FROM hits),
        mr AS (
          SELECT variant, round(avg(recall), 6) AS mean_recall
          FROM rec GROUP BY variant)
        SELECT r.variant, r.qid, r.n_hits, r.recall, mr.mean_recall
        FROM rec r JOIN mr ON mr.variant = r.variant
        ORDER BY r.variant, r.qid"""
  }

  private[operators] lazy val s7Sql: String =
    s"""WITH $s7ChainCtes
        SELECT vec_id, cell AS cluster,
          round(d + list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS dist2
        FROM af ORDER BY vec_id"""

  private[operators] lazy val s9Sql: String =
    s"""WITH $s7ChainCtes,
        d AS (
          SELECT cell,
            round(d + list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS dist2
          FROM af),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM embeddings)
        SELECT cell AS cluster, CAST(count(*) AS BIGINT) AS n_vectors,
          round(CAST(count(*) AS DOUBLE) / n.n_total, 6) AS share,
          round(avg(dist2), 6) AS avg_dist2, max(dist2) AS max_dist2
        FROM d, n GROUP BY cell, n.n_total ORDER BY cluster"""

  private[operators] lazy val s8Sql: String =
    s"""WITH $s7ChainCtes,
        nn AS (
          SELECT vec_id, embedding, cell,
            sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM af),
        pr AS (
          SELECT b.vec_id AS bid,
            list_sum(list_transform(range(1, ${dims + 1}),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)))
              / (a.nrm * b.nrm) AS cosine
          FROM nn a JOIN nn b
            ON a.cell = b.cell AND a.vec_id < b.vec_id),
        m AS (
          SELECT bid, CAST(count(*) AS BIGINT) AS n_dups,
            max(cosine) AS best_cosine
          FROM pr WHERE cosine >= $s8Tau GROUP BY 1)
        SELECT af.vec_id, af.cell AS cluster,
          COALESCE(m.n_dups, 0) AS n_dups, m.best_cosine,
          CASE WHEN m.bid IS NULL THEN 'keep' ELSE 'prune' END AS verdict
        FROM af LEFT JOIN m ON m.bid = af.vec_id
        ORDER BY af.vec_id"""

  /** S11 oracle: the base-slice Lloyd chain (same CTE generator as
    * s7's, different WHERE + init ids), the batch assigned under the
    * final base centroids, and the same count-weighted update —
    * recomputed relationally end-to-end. */
  private[operators] lazy val s11Sql: String = {
    val D = dims + 1
    s"""WITH ${lloydChainCtes(s"WHERE vec_id % $s11Mod != $s11Res",
          s11InitIds)},
        bb AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % $s11Mod = $s11Res),
        ${kmeansAssignSql(s"c$kmeansIters", "ba", "bb")},
        nb AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_base
               FROM af GROUP BY 1),
        mb AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_batch
               FROM ba GROUP BY 1),
        bs AS (SELECT cell, r.i AS pos,
                 sum(CAST(embedding[r.i] AS DOUBLE)) AS sv
               FROM ba, range(1, $D) r(i) GROUP BY 1, 2),
        cf AS (SELECT cell, vec FROM c$kmeansIters),
        np AS (
          SELECT cf.cell, r.i AS pos,
            coalesce(nb.n_base, 0) AS nbv, coalesce(mb.n_batch, 0) AS mbv,
            cf.vec[r.i] AS c, coalesce(bs.sv, 0.0) AS sv
          FROM cf CROSS JOIN range(1, $D) r(i)
          LEFT JOIN nb ON nb.cell = cf.cell
          LEFT JOIN mb ON mb.cell = cf.cell
          LEFT JOIN bs ON bs.cell = cf.cell AND bs.pos = r.i),
        ncte AS (
          SELECT cell, pos, nbv, mbv,
            CASE WHEN nbv + mbv = 0 THEN round(c, 6)
                 ELSE round((nbv * c + sv) / (nbv + mbv), 6) END AS nc
          FROM np),
        nv AS (SELECT cell, max(nbv) AS n_base, max(mbv) AS n_batch,
                 list(nc ORDER BY pos) AS nvec
               FROM ncte GROUP BY 1)
        SELECT nv.cell AS cluster, nv.n_base, nv.n_batch,
          round(sqrt(list_sum(list_transform(range(1, $D),
            i -> (nv.nvec[i] - cf.vec[i]) * (nv.nvec[i] - cf.vec[i])))), 6)
            AS shift,
          round(list_sum(list_transform(nv.nvec, x -> x * x)), 6) AS n2_new
        FROM nv JOIN cf ON cf.cell = nv.cell
        ORDER BY cluster"""
  }

  /** S10 oracle: an INDEPENDENT plan for the same serving path — the
    * c3 oracle chain feeds an unnest/GROUP BY recomputation of the
    * feature-hash embeddings (vs the Spark side's per-row HashEmbed
    * loop), the same plane geometry buckets both sides, and the same
    * multi-probe + exact-rerank join ranks. Embedding components are
    * integer sums, so every cosine compares exactly. */
  /** The hash-to-sign fold of the oracle's feature-hash embedder — ONE
    * definition for the index side ([[cidxCtes]]) and the query side
    * ([[s10SqlFor]]): two copies could silently desynchronize the
    * oracle's query embeddings from its index embeddings. */
  private[operators] lazy val signSumSql: String =
    "CAST(sum(CASE WHEN (h // $D) % 2 = 0 THEN 1 ELSE -1 END) AS DOUBLE)"
      .replace("$D", dims.toString)

  /** The corpus-side index CTE chain (c3 chunks → hash embeddings →
    * norms → buckets → the cidx frame), shared by every oracle that
    * reads the serving index ([[s10SqlFor]]'s family and [[prof8Sql]]).
    * `cWhere` is the s22 metadata pre-filter — applied in the SAME CTE
    * the engine filters (the persisted index), default TRUE. */
  private[operators] def cidxCtes(cWhere: String = "TRUE",
                       nPlanes: Int = planes): String = {
    val signSum = signSumSql
    s"""c3 AS (SELECT * FROM (${TextAnalysis.c3Sql})),
        ctok AS (SELECT doc_id, chunk_idx,
                   unnest(string_split(chunk_text, ' ')) AS w FROM c3),
        csum AS (
          SELECT doc_id, chunk_idx, h % $dims AS d, $signSum AS v
          FROM (SELECT doc_id, chunk_idx, ${Portable.h60pSql("w")} AS h
                FROM ctok)
          GROUP BY 1, 2, 3),
        cemb0 AS (
          SELECT c.doc_id, c.chunk_idx, r.i AS d, coalesce(s.v, 0.0) AS v
          FROM c3 c CROSS JOIN range(0, $dims) r(i)
          LEFT JOIN csum s ON s.doc_id = c.doc_id
            AND s.chunk_idx = c.chunk_idx AND s.d = r.i),
        cemb1 AS (SELECT doc_id, chunk_idx, list(v ORDER BY d) AS ce
                  FROM cemb0 GROUP BY 1, 2),
        cidx AS (
          SELECT c3.doc_id, c3.chunk_idx, c3.source, c3.quality_score,
            c3.chunk_text, e.ce,
            sqrt(list_sum(list_transform(e.ce, x -> x * x))) AS cn,
            ${bucketSql("e.ce", nPlanes)} AS bkt
          FROM c3 JOIN cemb1 e ON e.doc_id = c3.doc_id
            AND e.chunk_idx = c3.chunk_idx
          WHERE sqrt(list_sum(list_transform(e.ce, x -> x * x))) > 0
            AND ($cWhere))"""
  }

  /** `bucketed = false` drops the LSH candidate restriction entirely —
    * the scored CTE becomes the brute-force cross join, i.e. the SQL
    * twin of [[exactTwin]]; everything else (embedders, cosine, rank,
    * k) is shared, so the exact and served oracles can only diverge on
    * the one variable the eval measures (s32's contract). */
  private[operators] def s10SqlFor(qdWhere: String,
                        masksSql: String = probeMasksSql,
                        cWhere: String = "TRUE",
                        nPlanes: Int = planes,
                        bucketed: Boolean = true): String = {
    val signSum = signSumSql
    s"""WITH ${cidxCtes(cWhere, nPlanes)},
        qd AS (
          SELECT doc_id AS qid,
            list_slice(string_split_regex(trim(text), '\\s+'), 1,
              $s10QueryTokens) AS qtk
          FROM documents WHERE $qdWhere),
        qtok AS (SELECT qid, unnest(qtk) AS w FROM qd),
        qsum AS (
          SELECT qid, h % $dims AS d, $signSum AS v
          FROM (SELECT qid, ${Portable.h60pSql("w")} AS h FROM qtok)
          GROUP BY 1, 2),
        qemb0 AS (
          SELECT q.qid, r.i AS d, coalesce(s.v, 0.0) AS v
          FROM qd q CROSS JOIN range(0, $dims) r(i)
          LEFT JOIN qsum s ON s.qid = q.qid AND s.d = r.i),
        qemb1 AS (SELECT qid, list(v ORDER BY d) AS qe
                  FROM qemb0 GROUP BY 1),
        qx AS (
          SELECT qid, qe,
            sqrt(list_sum(list_transform(qe, x -> x * x))) AS qn,
            ${bucketSql("qe", nPlanes)} AS bkt0
          FROM qemb1
          WHERE sqrt(list_sum(list_transform(qe, x -> x * x))) > 0),
        ${
      if (bucketed)
        s"""qp AS (SELECT qid, qe, qn, xor(bkt0, m.m) AS bkt
               FROM qx, (SELECT unnest($masksSql) AS m) m),
        scored AS (
          SELECT q.qid, c.doc_id, c.chunk_idx, c.source, c.quality_score,
            c.chunk_text, $dotSql / (q.qn * c.cn) AS cosine
          FROM qp q JOIN cidx c USING (bkt)),"""
      else
        s"""scored AS (
          SELECT q.qid, c.doc_id, c.chunk_idx, c.source, c.quality_score,
            c.chunk_text, $dotSql / (q.qn * c.cn) AS cosine
          FROM qx q CROSS JOIN cidx c),"""
    }
        ranked AS (
          SELECT qid, doc_id, chunk_idx, source, quality_score,
            chunk_text, cosine,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, doc_id, chunk_idx) AS INT) AS rk
          FROM scored)
        SELECT qid, rk, doc_id, chunk_idx, cosine, source,
          quality_score, chunk_text
        FROM ranked WHERE rk <= $s10K ORDER BY qid, rk"""
  }

  private[operators] lazy val s10Sql: String =
    s10SqlFor(s"doc_id < $s10QueryDocs")

  /** s20 oracle: the s10 serving SQL with the radius-2 mask literal —
    * the mask list is the ONLY diff from [[s10Sql]], exactly mirroring
    * the engine-side pair (retrieveTopK radius 1 vs 2). */
  private[operators] lazy val s20Sql: String =
    s10SqlFor(s"doc_id < $s10QueryDocs", probeMasksSqlFor(2))

  /** s22 oracle: the s10 serving SQL with the quality pre-filter in
    * the index CTE — the predicate is the ONLY diff from [[s10Sql]],
    * mirroring the engine pair (filtered vs unfiltered index). */
  private[operators] lazy val s22Sql: String =
    s10SqlFor(s"doc_id < $s10QueryDocs", probeMasksSql,
      s"c3.quality_score >= $s22QualityFloor")

  /** prof8 oracle: bucket occupancy + the integer re-bucket rule over
    * the same index CTE chain; [[planesForCaseSql]] emits the SAME
    * CASE text both engines evaluate. SUM(BIGINT) is HUGEINT in
    * DuckDB — cast back (the standing divergence note). */
  private[operators] lazy val prof8Sql: String =
    s"""WITH ${cidxCtes()},
        occ AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n_chunks
                FROM cidx GROUP BY 1),
        tot AS (SELECT CAST(sum(n_chunks) AS BIGINT) AS n_total,
                  CAST(count(*) AS BIGINT) AS n_buckets,
                  CAST(max(n_chunks) AS BIGINT) AS max_occ FROM occ)
        SELECT occ.bkt, occ.n_chunks,
          round(occ.n_chunks / CAST(t.n_total AS DOUBLE), 6) AS share6,
          t.n_total, t.n_buckets, t.max_occ,
          $planes AS planes_committed,
          CAST(${planesForCaseSql("t.n_total")} AS INT)
            AS planes_recommended,
          CAST(${planesForCaseSql("t.n_total")} > $planes AS INT)
            AS rebucket_due
        FROM occ, tot t ORDER BY occ.bkt"""

  /** prof9 oracle: the deterministic-listing recompute — one presence
    * indicator per lifecycle write (base slice, then each of the 3
    * batch sub-slices), summed per bucket: a write lands exactly one
    * file in bucket b iff its doc slice contributes a chunk hashing to
    * b (the repartition-by-bucket write discipline). Slice predicates
    * are generated from the SAME s15Mod/s15Res constants the engine
    * slices by. Occupancy over the same index CTE chain as prof8. */
  /** prof9 golden VALUES rows — (n_docs, n_pos, bkt, kib) per
    * committed scale: the per-bucket store size in KiB under the
    * deterministic write discipline; harvested from two byte-identical
    * fresh-JVM runs per scale (2026-08-15; the sf1 key (50000, 49944)
    * added 2026-08-15 round 17 per the verdict — the full sf1 sweep
    * now exercises the size readout instead of failing the dispatch
    * join). Same re-harvest rule and pinned keys as [[s23Goldens]]. */
  private[operators] val prof9Goldens: String =
    """(500, 352, 0, 2),
            (500, 352, 1, 2),
            (500, 352, 2, 2),
            (500, 352, 3, 2),
            (500, 352, 4, 8),
            (500, 352, 5, 5),
            (500, 352, 7, 5),
            (500, 352, 14, 2),
            (500, 352, 16, 19),
            (500, 352, 17, 14),
            (500, 352, 18, 14),
            (500, 352, 19, 12),
            (500, 352, 20, 24),
            (500, 352, 21, 22),
            (500, 352, 22, 15),
            (500, 352, 23, 18),
            (500, 352, 24, 3),
            (500, 352, 25, 8),
            (500, 352, 26, 8),
            (500, 352, 27, 6),
            (500, 352, 28, 10),
            (500, 352, 29, 13),
            (500, 352, 30, 2),
            (500, 352, 31, 9),
            (500, 352, 32, 2),
            (500, 352, 34, 2),
            (500, 352, 36, 9),
            (500, 352, 37, 2),
            (500, 352, 38, 2),
            (500, 352, 48, 13),
            (500, 352, 49, 6),
            (500, 352, 50, 7),
            (500, 352, 51, 5),
            (500, 352, 52, 29),
            (500, 352, 53, 17),
            (500, 352, 54, 16),
            (500, 352, 55, 15),
            (500, 352, 56, 2),
            (500, 352, 58, 2),
            (500, 352, 59, 2),
            (500, 352, 60, 5),
            (500, 352, 61, 9),
            (500, 352, 62, 3),
            (500, 352, 63, 6),
            (500, 343, 0, 2),
            (500, 343, 2, 2),
            (500, 343, 3, 5),
            (500, 343, 4, 6),
            (500, 343, 5, 8),
            (500, 343, 6, 2),
            (500, 343, 7, 8),
            (500, 343, 10, 2),
            (500, 343, 13, 2),
            (500, 343, 16, 18),
            (500, 343, 17, 15),
            (500, 343, 18, 14),
            (500, 343, 19, 16),
            (500, 343, 20, 24),
            (500, 343, 21, 22),
            (500, 343, 22, 15),
            (500, 343, 23, 17),
            (500, 343, 24, 6),
            (500, 343, 25, 3),
            (500, 343, 26, 5),
            (500, 343, 27, 3),
            (500, 343, 28, 13),
            (500, 343, 29, 12),
            (500, 343, 30, 5),
            (500, 343, 31, 13),
            (500, 343, 36, 2),
            (500, 343, 38, 2),
            (500, 343, 48, 14),
            (500, 343, 49, 3),
            (500, 343, 50, 10),
            (500, 343, 51, 2),
            (500, 343, 52, 26),
            (500, 343, 53, 17),
            (500, 343, 54, 15),
            (500, 343, 55, 14),
            (500, 343, 56, 3),
            (500, 343, 58, 2),
            (500, 343, 60, 6),
            (500, 343, 61, 11),
            (500, 343, 62, 2),
            (500, 343, 63, 6),
            (5000, 3468, 0, 9),
            (5000, 3468, 1, 8),
            (5000, 3468, 2, 6),
            (5000, 3468, 3, 13),
            (5000, 3468, 4, 16),
            (5000, 3468, 5, 15),
            (5000, 3468, 6, 15),
            (5000, 3468, 7, 17),
            (5000, 3468, 8, 2),
            (5000, 3468, 12, 5),
            (5000, 3468, 13, 5),
            (5000, 3468, 14, 2),
            (5000, 3468, 15, 5),
            (5000, 3468, 16, 76),
            (5000, 3468, 17, 45),
            (5000, 3468, 18, 42),
            (5000, 3468, 19, 48),
            (5000, 3468, 20, 133),
            (5000, 3468, 21, 101),
            (5000, 3468, 22, 56),
            (5000, 3468, 23, 78),
            (5000, 3468, 24, 15),
            (5000, 3468, 25, 16),
            (5000, 3468, 26, 11),
            (5000, 3468, 27, 16),
            (5000, 3468, 28, 20),
            (5000, 3468, 29, 29),
            (5000, 3468, 30, 14),
            (5000, 3468, 31, 25),
            (5000, 3468, 32, 2),
            (5000, 3468, 34, 5),
            (5000, 3468, 35, 2),
            (5000, 3468, 36, 9),
            (5000, 3468, 37, 9),
            (5000, 3468, 38, 9),
            (5000, 3468, 39, 12),
            (5000, 3468, 45, 5),
            (5000, 3468, 47, 2),
            (5000, 3468, 48, 45),
            (5000, 3468, 49, 17),
            (5000, 3468, 50, 24),
            (5000, 3468, 51, 17),
            (5000, 3468, 52, 157),
            (5000, 3468, 53, 74),
            (5000, 3468, 54, 51),
            (5000, 3468, 55, 43),
            (5000, 3468, 56, 12),
            (5000, 3468, 57, 3),
            (5000, 3468, 58, 9),
            (5000, 3468, 59, 12),
            (5000, 3468, 60, 20),
            (5000, 3468, 61, 17),
            (5000, 3468, 62, 10),
            (5000, 3468, 63, 16),
            (50000, 49944, 0, 1492),
            (50000, 49944, 1, 210),
            (50000, 49944, 2, 494),
            (50000, 49944, 3, 80),
            (50000, 49944, 4, 619),
            (50000, 49944, 5, 102),
            (50000, 49944, 6, 192),
            (50000, 49944, 7, 41),
            (50000, 49944, 8, 2166),
            (50000, 49944, 9, 481),
            (50000, 49944, 10, 1413),
            (50000, 49944, 11, 366),
            (50000, 49944, 12, 569),
            (50000, 49944, 13, 169),
            (50000, 49944, 14, 398),
            (50000, 49944, 15, 128),
            (50000, 49944, 16, 444),
            (50000, 49944, 17, 98),
            (50000, 49944, 18, 149),
            (50000, 49944, 19, 43),
            (50000, 49944, 20, 450),
            (50000, 49944, 21, 120),
            (50000, 49944, 22, 152),
            (50000, 49944, 23, 48),
            (50000, 49944, 24, 671),
            (50000, 49944, 25, 255),
            (50000, 49944, 26, 414),
            (50000, 49944, 27, 177),
            (50000, 49944, 28, 492),
            (50000, 49944, 29, 220),
            (50000, 49944, 30, 336),
            (50000, 49944, 31, 167),
            (50000, 49944, 32, 1037),
            (50000, 49944, 33, 124),
            (50000, 49944, 34, 301),
            (50000, 49944, 35, 45),
            (50000, 49944, 36, 905),
            (50000, 49944, 37, 121),
            (50000, 49944, 38, 249),
            (50000, 49944, 39, 45),
            (50000, 49944, 40, 3278),
            (50000, 49944, 41, 684),
            (50000, 49944, 42, 1888),
            (50000, 49944, 43, 481),
            (50000, 49944, 44, 1980),
            (50000, 49944, 45, 479),
            (50000, 49944, 46, 1115),
            (50000, 49944, 47, 347),
            (50000, 49944, 48, 268),
            (50000, 49944, 49, 54),
            (50000, 49944, 50, 79),
            (50000, 49944, 51, 27),
            (50000, 49944, 52, 608),
            (50000, 49944, 53, 134),
            (50000, 49944, 54, 179),
            (50000, 49944, 55, 51),
            (50000, 49944, 56, 781),
            (50000, 49944, 57, 257),
            (50000, 49944, 58, 419),
            (50000, 49944, 59, 176),
            (50000, 49944, 60, 1268),
            (50000, 49944, 61, 531),
            (50000, 49944, 62, 789),
            (50000, 49944, 63, 396)"""

  private[operators] lazy val prof9Sql: String = {
    val base = s"doc_id % $s15Mod <> $s15Res"
    val slices = (0 until prof9Parts).map(r =>
      s"doc_id % $s15Mod = $s15Res AND doc_id % $prof9Parts = $r")
    val presence = (base +: slices).map(p =>
      s"max(CASE WHEN $p THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ${graft.queries.MlQueries.dispatchKeyCtes},
        ${cidxCtes()},
        pb AS (
          SELECT bkt, CAST(count(*) AS BIGINT) AS n_chunks,
            CAST($presence AS BIGINT) AS files,
            CAST(($presence) >= $prof9FileBudget AS INT) AS compact_due
          FROM cidx GROUP BY bkt),
        g AS (
          SELECT v.bkt, v.kib FROM (VALUES
            $prof9Goldens)
            v(n_docs, n_pos, bkt, kib)
          JOIN k ON v.n_docs = k.n_docs AND v.n_pos = k.n_pos)
        SELECT k.n_docs, k.n_pos, pb.bkt, pb.n_chunks, pb.files,
          CAST(g.kib AS BIGINT) AS kib, pb.compact_due
        FROM pb JOIN g ON g.bkt = pb.bkt, k
        ORDER BY pb.bkt"""
  }


  /** s23 golden VALUES rows — (n_docs, n_pos, qid, rk, doc_id,
    * chunk_idx) per committed scale; harvested from two byte-identical
    * fresh-JVM runs per scale (2026-08-15). The m7 BLAS caveat applies
    * (Word2Vec's axpy rides netlib).
    *
    * RE-HARVEST RULE (new scale / changed corpus or embedder): the
    * pinned keys are sf0.001 (500, 352), sf0.01 (500, 343), sf0.1
    * (5000, 3468) — running the gate at any OTHER scale joins zero
    * VALUES rows and fails as an oracle row-count mismatch (0 vs 40):
    * that failure means "no golden harvested for this scale", not a
    * serving bug. To extend: run the engine query twice in fresh JVMs
    * at the new scale, assert byte-identical output, and append the
    * rows here keyed by the new (n_docs, n_pos) — the m7/u14
    * procedure. */
  private[operators] val s23Goldens: String =
    """(500, 352, 0, 1, 373, 0),
            (500, 352, 0, 2, 2, 1),
            (500, 352, 0, 3, 402, 1),
            (500, 352, 0, 4, 34, 2),
            (500, 352, 0, 5, 343, 1),
            (500, 352, 1, 1, 499, 0),
            (500, 352, 1, 2, 420, 1),
            (500, 352, 1, 3, 205, 0),
            (500, 352, 1, 4, 295, 0),
            (500, 352, 1, 5, 374, 0),
            (500, 352, 2, 1, 249, 1),
            (500, 352, 2, 2, 187, 2),
            (500, 352, 2, 3, 322, 1),
            (500, 352, 2, 4, 330, 0),
            (500, 352, 2, 5, 31, 1),
            (500, 352, 3, 1, 452, 0),
            (500, 352, 3, 2, 390, 0),
            (500, 352, 3, 3, 19, 1),
            (500, 352, 3, 4, 247, 0),
            (500, 352, 3, 5, 223, 0),
            (500, 352, 4, 1, 412, 2),
            (500, 352, 4, 2, 111, 1),
            (500, 352, 4, 3, 494, 3),
            (500, 352, 4, 4, 474, 3),
            (500, 352, 4, 5, 498, 3),
            (500, 352, 5, 1, 124, 0),
            (500, 352, 5, 2, 173, 0),
            (500, 352, 5, 3, 380, 1),
            (500, 352, 5, 4, 213, 0),
            (500, 352, 5, 5, 421, 1),
            (500, 352, 6, 1, 44, 1),
            (500, 352, 6, 2, 177, 0),
            (500, 352, 6, 3, 255, 1),
            (500, 352, 6, 4, 230, 2),
            (500, 352, 6, 5, 124, 1),
            (500, 352, 7, 1, 240, 0),
            (500, 352, 7, 2, 316, 1),
            (500, 352, 7, 3, 465, 2),
            (500, 352, 7, 4, 486, 1),
            (500, 352, 7, 5, 162, 0),
            (500, 343, 0, 1, 409, 1),
            (500, 343, 0, 2, 137, 0),
            (500, 343, 0, 3, 215, 2),
            (500, 343, 0, 4, 45, 0),
            (500, 343, 0, 5, 267, 0),
            (500, 343, 1, 1, 22, 0),
            (500, 343, 1, 2, 218, 0),
            (500, 343, 1, 3, 285, 1),
            (500, 343, 1, 4, 301, 1),
            (500, 343, 1, 5, 73, 0),
            (500, 343, 2, 1, 466, 3),
            (500, 343, 2, 2, 35, 0),
            (500, 343, 2, 3, 91, 0),
            (500, 343, 2, 4, 325, 0),
            (500, 343, 2, 5, 278, 2),
            (500, 343, 3, 1, 311, 1),
            (500, 343, 3, 2, 3, 0),
            (500, 343, 3, 3, 294, 3),
            (500, 343, 3, 4, 316, 2),
            (500, 343, 3, 5, 150, 1),
            (500, 343, 4, 1, 351, 0),
            (500, 343, 4, 2, 17, 0),
            (500, 343, 4, 3, 484, 1),
            (500, 343, 4, 4, 174, 0),
            (500, 343, 4, 5, 28, 0),
            (500, 343, 5, 1, 188, 1),
            (500, 343, 5, 2, 5, 0),
            (500, 343, 5, 3, 297, 1),
            (500, 343, 5, 4, 399, 1),
            (500, 343, 5, 5, 453, 1),
            (500, 343, 6, 1, 436, 1),
            (500, 343, 6, 2, 266, 1),
            (500, 343, 6, 3, 465, 2),
            (500, 343, 6, 4, 388, 1),
            (500, 343, 6, 5, 250, 1),
            (500, 343, 7, 1, 215, 0),
            (500, 343, 7, 2, 360, 2),
            (500, 343, 7, 3, 135, 1),
            (500, 343, 7, 4, 499, 0),
            (500, 343, 7, 5, 102, 2),
            (5000, 3468, 0, 1, 4486, 1),
            (5000, 3468, 0, 2, 4652, 2),
            (5000, 3468, 0, 3, 4048, 3),
            (5000, 3468, 0, 4, 4385, 3),
            (5000, 3468, 0, 5, 3309, 2),
            (5000, 3468, 1, 1, 3728, 3),
            (5000, 3468, 1, 2, 1717, 0),
            (5000, 3468, 1, 3, 3446, 3),
            (5000, 3468, 1, 4, 1249, 2),
            (5000, 3468, 1, 5, 212, 1),
            (5000, 3468, 2, 1, 1132, 1),
            (5000, 3468, 2, 2, 1630, 1),
            (5000, 3468, 2, 3, 2030, 0),
            (5000, 3468, 2, 4, 4007, 1),
            (5000, 3468, 2, 5, 3007, 1),
            (5000, 3468, 3, 1, 1779, 2),
            (5000, 3468, 3, 2, 3, 0),
            (5000, 3468, 3, 3, 3039, 1),
            (5000, 3468, 3, 4, 4170, 1),
            (5000, 3468, 3, 5, 1084, 1),
            (5000, 3468, 4, 1, 2201, 1),
            (5000, 3468, 4, 2, 1125, 0),
            (5000, 3468, 4, 3, 2088, 0),
            (5000, 3468, 4, 4, 3988, 2),
            (5000, 3468, 4, 5, 1155, 0),
            (5000, 3468, 5, 1, 5, 0),
            (5000, 3468, 5, 2, 88, 0),
            (5000, 3468, 5, 3, 3919, 0),
            (5000, 3468, 5, 4, 4970, 2),
            (5000, 3468, 5, 5, 2811, 1),
            (5000, 3468, 6, 1, 2444, 2),
            (5000, 3468, 6, 2, 1480, 1),
            (5000, 3468, 6, 3, 1324, 2),
            (5000, 3468, 6, 4, 875, 2),
            (5000, 3468, 6, 5, 2625, 2),
            (5000, 3468, 7, 1, 2736, 2),
            (5000, 3468, 7, 2, 2594, 0),
            (5000, 3468, 7, 3, 7, 0),
            (5000, 3468, 7, 4, 2844, 0),
            (5000, 3468, 7, 5, 2967, 1)"""

  /** s23 oracle: the m7 golden-dispatch pattern on the serving domain —
    * fitted Word2Vec vectors aren't SQL-recomputable, but the fit is
    * content-deterministic, so the bounded top-k id frame is pinned per
    * scale as VALUES and dispatched on the (n_docs, n_pos) key DuckDB
    * recomputes through the m6 label chain (the ONE dispatchKeyCtes
    * text m7/u14/c4 share). */
  private[operators] lazy val s23Sql: String =
    s"""WITH ${graft.queries.MlQueries.dispatchKeyCtes}
        SELECT CAST(v.n_docs AS BIGINT) AS n_docs,
          CAST(v.n_pos AS BIGINT) AS n_pos,
          CAST(v.qid AS BIGINT) AS qid, CAST(v.rk AS INT) AS rk,
          CAST(v.doc_id AS BIGINT) AS doc_id,
          CAST(v.chunk_idx AS INT) AS chunk_idx
        FROM (VALUES
            $s23Goldens)
            v(n_docs, n_pos, qid, rk, doc_id, chunk_idx)
        JOIN k ON v.n_docs = k.n_docs AND v.n_pos = k.n_pos
        ORDER BY v.qid, v.rk"""

  /** s28 golden VALUES rows — (n_docs, n_pos, qid, rk, doc_id,
    * chunk_idx, dense_rk, sparse_rk) per committed scale, NULL where a
    * leg missed the fused item; harvested from two byte-identical
    * fresh-JVM runs per scale (2026-08-15). Same re-harvest rule and
    * pinned keys as [[s23Goldens]] (a new scale joins zero rows and
    * fails as an oracle row-count mismatch — harvest, verify two
    * fresh-JVM runs byte-identical, append). The m7 BLAS caveat
    * applies through the dense leg's Word2Vec fit. */
  private[operators] val s28Goldens: String =
    """(500, 352, 0, 1, 338, 1, NULL, 1),
            (500, 352, 0, 2, 373, 0, 1, NULL),
            (500, 352, 0, 3, 2, 1, 2, NULL),
            (500, 352, 0, 4, 381, 1, NULL, 2),
            (500, 352, 0, 5, 387, 0, NULL, 3),
            (500, 352, 1, 1, 205, 0, 3, 3),
            (500, 352, 1, 2, 1, 0, NULL, 1),
            (500, 352, 1, 3, 499, 0, 1, NULL),
            (500, 352, 1, 4, 227, 2, NULL, 2),
            (500, 352, 1, 5, 420, 1, 2, NULL),
            (500, 352, 2, 1, 2, 0, NULL, 1),
            (500, 352, 2, 2, 249, 1, 1, NULL),
            (500, 352, 2, 3, 187, 2, 2, NULL),
            (500, 352, 2, 4, 453, 0, NULL, 2),
            (500, 352, 2, 5, 236, 0, NULL, 3),
            (500, 352, 3, 1, 212, 1, NULL, 1),
            (500, 352, 3, 2, 452, 0, 1, NULL),
            (500, 352, 3, 3, 30, 1, NULL, 2),
            (500, 352, 3, 4, 390, 0, 2, NULL),
            (500, 352, 3, 5, 19, 1, 3, NULL),
            (500, 352, 4, 1, 110, 2, NULL, 1),
            (500, 352, 4, 2, 412, 2, 1, NULL),
            (500, 352, 4, 3, 111, 1, 2, NULL),
            (500, 352, 4, 4, 467, 2, NULL, 2),
            (500, 352, 4, 5, 148, 0, NULL, 3),
            (500, 352, 5, 1, 124, 0, 1, 2),
            (500, 352, 5, 2, 380, 1, 3, 5),
            (500, 352, 5, 3, 113, 1, NULL, 1),
            (500, 352, 5, 4, 173, 0, 2, NULL),
            (500, 352, 5, 5, 99, 0, NULL, 3),
            (500, 352, 6, 1, 44, 1, 1, NULL),
            (500, 352, 6, 2, 224, 1, NULL, 1),
            (500, 352, 6, 3, 76, 0, NULL, 2),
            (500, 352, 6, 4, 177, 0, 2, NULL),
            (500, 352, 6, 5, 6, 0, NULL, 3),
            (500, 352, 7, 1, 7, 0, NULL, 1),
            (500, 352, 7, 2, 240, 0, 1, NULL),
            (500, 352, 7, 3, 272, 0, NULL, 2),
            (500, 352, 7, 4, 316, 1, 2, NULL),
            (500, 352, 7, 5, 453, 0, NULL, 3),
            (500, 343, 0, 1, 0, 0, NULL, 1),
            (500, 343, 0, 2, 409, 1, 1, NULL),
            (500, 343, 0, 3, 99, 0, NULL, 2),
            (500, 343, 0, 4, 137, 0, 2, NULL),
            (500, 343, 0, 5, 215, 2, 3, NULL),
            (500, 343, 1, 1, 22, 0, 1, NULL),
            (500, 343, 1, 2, 252, 0, NULL, 1),
            (500, 343, 1, 3, 1, 0, NULL, 2),
            (500, 343, 1, 4, 218, 0, 2, NULL),
            (500, 343, 1, 5, 285, 1, 3, NULL),
            (500, 343, 2, 1, 35, 0, 2, 2),
            (500, 343, 2, 2, 2, 0, NULL, 1),
            (500, 343, 2, 3, 466, 3, 1, NULL),
            (500, 343, 2, 4, 91, 0, 3, NULL),
            (500, 343, 2, 5, 386, 2, NULL, 3),
            (500, 343, 3, 1, 3, 0, 2, 1),
            (500, 343, 3, 2, 311, 1, 1, NULL),
            (500, 343, 3, 3, 14, 2, NULL, 2),
            (500, 343, 3, 4, 131, 1, NULL, 3),
            (500, 343, 3, 5, 294, 3, 3, NULL),
            (500, 343, 4, 1, 174, 0, 4, 4),
            (500, 343, 4, 2, 145, 0, NULL, 1),
            (500, 343, 4, 3, 351, 0, 1, NULL),
            (500, 343, 4, 4, 17, 0, 2, NULL),
            (500, 343, 4, 5, 24, 0, NULL, 2),
            (500, 343, 5, 1, 5, 0, 2, 4),
            (500, 343, 5, 2, 188, 1, 1, NULL),
            (500, 343, 5, 3, 437, 1, NULL, 1),
            (500, 343, 5, 4, 430, 0, NULL, 2),
            (500, 343, 5, 5, 173, 0, NULL, 3),
            (500, 343, 6, 1, 436, 1, 1, 3),
            (500, 343, 6, 2, 326, 0, NULL, 1),
            (500, 343, 6, 3, 266, 1, 2, NULL),
            (500, 343, 6, 4, 457, 0, NULL, 2),
            (500, 343, 6, 5, 465, 2, 3, NULL),
            (500, 343, 7, 1, 360, 2, 2, 2),
            (500, 343, 7, 2, 215, 0, 1, 5),
            (500, 343, 7, 3, 7, 0, NULL, 1),
            (500, 343, 7, 4, 135, 1, 3, NULL),
            (500, 343, 7, 5, 280, 1, NULL, 3),
            (5000, 3468, 0, 1, 4652, 2, 2, 4),
            (5000, 3468, 0, 2, 0, 0, NULL, 1),
            (5000, 3468, 0, 3, 4486, 1, 1, NULL),
            (5000, 3468, 0, 4, 3606, 0, NULL, 2),
            (5000, 3468, 0, 5, 4048, 3, 3, NULL),
            (5000, 3468, 1, 1, 212, 1, 5, 4),
            (5000, 3468, 1, 2, 65, 0, NULL, 1),
            (5000, 3468, 1, 3, 3728, 3, 1, NULL),
            (5000, 3468, 1, 4, 985, 1, NULL, 2),
            (5000, 3468, 1, 5, 1717, 0, 2, NULL),
            (5000, 3468, 2, 1, 213, 0, NULL, 1),
            (5000, 3468, 2, 2, 1132, 1, 1, NULL),
            (5000, 3468, 2, 3, 1630, 1, 2, NULL),
            (5000, 3468, 2, 4, 3495, 0, NULL, 2),
            (5000, 3468, 2, 5, 2030, 0, 3, NULL),
            (5000, 3468, 3, 1, 3, 0, 2, 2),
            (5000, 3468, 3, 2, 1779, 2, 1, NULL),
            (5000, 3468, 3, 3, 4792, 1, NULL, 1),
            (5000, 3468, 3, 4, 190, 1, NULL, 3),
            (5000, 3468, 3, 5, 3039, 1, 3, NULL),
            (5000, 3468, 4, 1, 2201, 1, 1, NULL),
            (5000, 3468, 4, 2, 4378, 2, NULL, 1),
            (5000, 3468, 4, 3, 1125, 0, 2, NULL),
            (5000, 3468, 4, 4, 1594, 0, NULL, 2),
            (5000, 3468, 4, 5, 1922, 1, NULL, 3),
            (5000, 3468, 5, 1, 5, 0, 1, 2),
            (5000, 3468, 5, 2, 3919, 0, 3, 3),
            (5000, 3468, 5, 3, 4749, 0, NULL, 1),
            (5000, 3468, 5, 4, 88, 0, 2, NULL),
            (5000, 3468, 5, 5, 3918, 0, NULL, 4),
            (5000, 3468, 6, 1, 2444, 2, 1, NULL),
            (5000, 3468, 6, 2, 4697, 0, NULL, 1),
            (5000, 3468, 6, 3, 1480, 1, 2, NULL),
            (5000, 3468, 6, 4, 3176, 0, NULL, 2),
            (5000, 3468, 6, 5, 1324, 2, 3, NULL),
            (5000, 3468, 7, 1, 7, 0, 3, 1),
            (5000, 3468, 7, 2, 2736, 2, 1, NULL),
            (5000, 3468, 7, 3, 481, 1, NULL, 2),
            (5000, 3468, 7, 4, 2594, 0, 2, NULL),
            (5000, 3468, 7, 5, 4488, 1, NULL, 3)"""

  /** s28 oracle: the s23 golden-dispatch pattern on the FUSED stack —
    * both legs' ranks ride in the pinned rows (ints, NULL where a leg
    * missed), the rrf double stays engine-side (pure arithmetic over
    * the pinned ranks; the spec recomputes it), and the rows dispatch
    * on the (n_docs, n_pos) key DuckDB recomputes through the m6
    * chain. */
  private[operators] lazy val s28Sql: String =
    s"""WITH ${graft.queries.MlQueries.dispatchKeyCtes}
        SELECT CAST(v.n_docs AS BIGINT) AS n_docs,
          CAST(v.n_pos AS BIGINT) AS n_pos,
          CAST(v.qid AS BIGINT) AS qid, CAST(v.rk AS INT) AS rk,
          CAST(v.doc_id AS BIGINT) AS doc_id,
          CAST(v.chunk_idx AS INT) AS chunk_idx,
          CAST(v.dense_rk AS INT) AS dense_rk,
          CAST(v.sparse_rk AS INT) AS sparse_rk
        FROM (VALUES
            $s28Goldens)
            v(n_docs, n_pos, qid, rk, doc_id, chunk_idx, dense_rk,
              sparse_rk)
        JOIN k ON v.n_docs = k.n_docs AND v.n_pos = k.n_pos
        ORDER BY v.qid, v.rk"""

  /** Parameterized s17/s18 oracle — a full relational BM25 recompute
    * over the c3 chunk chain: per-chunk tf + len, per-token df, corpus
    * (N, avgdl), then the SAME term expression as [[bm25TopK]] with
    * identical association and the Scala-interpolated double constants
    * (Double.toString round-trips, so both engines see bit-identical
    * k1/b values); term weights cast to integer micro-units before the
    * exact integer sum, so the whole output compares exactly. */
  /** Raw-postings dual as CTE text — `st` (exploded tokens + chunk
    * len) and `tf` (per-(token, doc, chunk) counts) over a
    * chunk-corpus CTE `src` with an optional doc predicate: the ONE
    * oracle-side twin of [[rawPostings]], shared by the s17/s18 BM25
    * duals and d16's fold counts so a tokenization change cannot
    * desynchronize the oracle copies (the engine side already has one
    * definition for exactly this reason). */
  private[operators] def postingsTfCtes(src: String,
                                        where: String = "TRUE"): String =
    s"""st AS (SELECT doc_id, chunk_idx,
                 len(string_split(chunk_text, ' ')) AS len,
                 unnest(string_split(chunk_text, ' ')) AS token
               FROM $src WHERE $where),
        tf AS (SELECT token, doc_id, chunk_idx, len,
                 CAST(count(*) AS BIGINT) AS tf
               FROM st GROUP BY 1, 2, 3, 4)"""

  private[operators] def bm25SqlFor(qdWhere: String): String =
    s"""WITH c3s AS (SELECT * FROM (${TextAnalysis.c3Sql})),
        ${postingsTfCtes("c3s")},
        dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
                 round(CAST(sum(len) AS DOUBLE) / count(*), 6) AS avgdl
               FROM (SELECT DISTINCT doc_id, chunk_idx, len FROM tf)),
        qt0 AS (
          SELECT doc_id AS qid,
            unnest(list_slice(string_split_regex(trim(text), '\\s+'), 1,
              $s10QueryTokens)) AS token
          FROM documents WHERE $qdWhere),
        qt AS (SELECT DISTINCT qid, token FROM qt0),
        terms AS (
          SELECT q.qid, p.doc_id, p.chunk_idx,
            CAST(round(ln((n.n_chunks - d.df + 0.5) / (d.df + 0.5) + 1.0)
              * ((p.tf * CAST(${bm25K1 + 1} AS DOUBLE))
                 / (p.tf + CAST($bm25K1 AS DOUBLE)
                    * (CAST(${1.0 - bm25B} AS DOUBLE)
                       + CAST($bm25B AS DOUBLE) * p.len / n.avgdl)))
              * 1e6) AS BIGINT) AS term6
          FROM qt q JOIN tf p USING (token) JOIN dfq d USING (token), ns n),
        sc AS (SELECT qid, doc_id, chunk_idx,
                 CAST(sum(term6) AS BIGINT) AS bm25_6
               FROM terms GROUP BY 1, 2, 3),
        rankedb AS (
          SELECT qid, doc_id, chunk_idx, bm25_6,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY bm25_6 DESC, doc_id, chunk_idx) AS INT) AS rk
          FROM sc)
        SELECT qid, rk, doc_id, chunk_idx, bm25_6 FROM rankedb
        WHERE rk <= $s10K ORDER BY qid, rk"""

  private[operators] lazy val s17Sql: String =
    bm25SqlFor(s"doc_id < $s10QueryDocs")

  private[operators] lazy val s18Sql: String =
    bm25SqlFor(s"doc_id >= $s10QueryDocs AND doc_id < ${2 * s10QueryDocs}")

  /** s15 oracle: the SAME full-corpus serving SQL over the [8,16)
    * query window — the refreshed index is row-identical to a full
    * rebuild (encode is corpus-independent; spec pins the set
    * equality), so the fold-in path must reproduce exactly what a
    * rebuild would serve. */
  private[operators] lazy val s15Sql: String =
    s10SqlFor(s"doc_id >= $s10QueryDocs AND doc_id < ${2 * s10QueryDocs}")

  /** s26 oracle: the s10 serving SQL with the plane count dialed to
    * [[s26Planes]] through the SAME parameterized generators — the
    * geometry is the ONLY diff from [[s10Sql]] (the one-variable
    * pattern on the re-bucket dimension). */
  private[operators] lazy val s26Sql: String =
    s10SqlFor(s"doc_id < $s10QueryDocs",
      probeMasksSqlFor(1, s26Planes), "TRUE", s26Planes)

  /** S32 oracle: s26's serving SQL (the post-event served leg) and the
    * bucketless exact variant of the SAME generator (the post-event
    * ground truth), fused by s31's recall tail — the three pieces the
    * engine composes, each already an oracled contract. */
  private[operators] lazy val s32Sql: String = {
    val exactSql = s10SqlFor(s"doc_id < $s10QueryDocs",
      probeMasksSqlFor(1, s26Planes), "TRUE", s26Planes, bucketed = false)
    s"""WITH served AS (
          SELECT qid, doc_id, chunk_idx FROM ($s26Sql)),
        exact AS (
          SELECT qid, doc_id, chunk_idx FROM ($exactSql)),
        hits AS (
          SELECT q.qid, CAST(count(a.doc_id) AS BIGINT) AS n_hits
          FROM (SELECT DISTINCT qid FROM exact) q
          LEFT JOIN (
            SELECT s.qid, s.doc_id FROM served s
            JOIN exact e ON e.qid = s.qid AND e.doc_id = s.doc_id
              AND e.chunk_idx = s.chunk_idx) a ON a.qid = q.qid
          GROUP BY q.qid),
        rec AS (
          SELECT qid, n_hits,
            round(CAST(n_hits AS DOUBLE) / $s10K, 6) AS recall
          FROM hits),
        mr AS (SELECT round(avg(recall), 6) AS mean_recall FROM rec)
        SELECT r.qid, r.n_hits, r.recall, mr.mean_recall
        FROM rec r CROSS JOIN mr ORDER BY r.qid"""
  }

  /** s29 oracle: the SAME parameterized generator with both gated
    * dials set — s26's plane count and s22/s25's quality predicate. */
  private[operators] lazy val s29Sql: String =
    s10SqlFor(s"doc_id < $s10QueryDocs",
      probeMasksSqlFor(1, s26Planes),
      s"c3.quality_score >= $s22QualityFloor", s26Planes)

  /** s24 oracle: the s15 serving SQL with the tombstone rule excluded
    * in the index CTE — the delete predicate is the ONLY diff (the s22
    * one-variable pattern), so the gate isolates exactly the fold:
    * served-after-fold ≡ rebuild-minus-deleted. */
  private[operators] lazy val s24Sql: String =
    s10SqlFor(s"doc_id >= $s10QueryDocs AND doc_id < ${2 * s10QueryDocs}",
      probeMasksSql,
      s"NOT (c3.doc_id % $s24DelMod = $s24DelRes)")

  /** s16 oracle: the s10 serving SQL as the dense leg, a relational
    * TF-IDF inverted-index recompute as the sparse leg (tf per
    * (token, chunk), df per token, idf in integer micro-nats — the
    * exact-integer-sum contract), and the RRF arithmetic verbatim
    * (CAST(1 AS DOUBLE) so DuckDB divides in DOUBLE, not DECIMAL). */
  private[operators] lazy val s16Sql: String =
    s"""WITH den AS (
          SELECT qid, doc_id, chunk_idx, rk AS dense_rk FROM ($s10Sql)),
        c3s AS (SELECT * FROM (${TextAnalysis.c3Sql})),
        st AS (SELECT doc_id, chunk_idx,
                 unnest(string_split(chunk_text, ' ')) AS token
               FROM c3s),
        tf AS (SELECT token, doc_id, chunk_idx,
                 CAST(count(*) AS BIGINT) AS tf
               FROM st GROUP BY 1, 2, 3),
        dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY 1),
        nch AS (SELECT CAST(count(*) AS DOUBLE) AS n_chunks FROM c3s),
        post AS (
          SELECT tf.token, tf.doc_id, tf.chunk_idx, tf.tf,
            CAST(round(ln(n.n_chunks / dfq.df) * 1e6) AS BIGINT) AS idf6
          FROM tf JOIN dfq USING (token), nch n),
        qt0 AS (
          SELECT doc_id AS qid,
            unnest(list_slice(string_split_regex(trim(text), '\\s+'), 1,
              $s10QueryTokens)) AS token
          FROM documents WHERE doc_id < $s10QueryDocs),
        qt AS (SELECT DISTINCT qid, token FROM qt0),
        ssc AS (
          SELECT q.qid, p.doc_id, p.chunk_idx, sum(p.tf * p.idf6) AS ssc
          FROM qt q JOIN post p USING (token) GROUP BY 1, 2, 3),
        sp AS (
          SELECT qid, doc_id, chunk_idx, sparse_rk FROM (
            SELECT qid, doc_id, chunk_idx,
              CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY ssc DESC, doc_id, chunk_idx) AS INT) AS sparse_rk
            FROM ssc)
          WHERE sparse_rk <= $s10K),
        $rrfFuseSqlTail"""

  /** Shared RRF fusion SQL tail — appended after CTEs `den`
    * (qid, doc_id, chunk_idx, dense_rk) and `sp` (…, sparse_rk); the
    * verbatim arithmetic of [[rrfFuse]] (CAST(1 AS DOUBLE) so DuckDB
    * divides in DOUBLE, not DECIMAL). Shared by the s16 and s19
    * oracles so fusion semantics are written exactly once. */
  private[operators] lazy val rrfFuseSqlTail: String =
    s"""fu AS (
          SELECT COALESCE(d.qid, s.qid) AS qid,
            COALESCE(d.doc_id, s.doc_id) AS doc_id,
            COALESCE(d.chunk_idx, s.chunk_idx) AS chunk_idx,
            d.dense_rk, s.sparse_rk,
            round(COALESCE(CAST(1 AS DOUBLE) / ($rrfK + d.dense_rk), 0)
              + COALESCE(CAST(1 AS DOUBLE) / ($rrfK + s.sparse_rk), 0), 6)
              AS rrf
          FROM den d FULL JOIN sp s
            ON d.qid = s.qid AND d.doc_id = s.doc_id
              AND d.chunk_idx = s.chunk_idx),
        rankedf AS (
          SELECT qid, doc_id, chunk_idx, rrf, dense_rk, sparse_rk,
            CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY rrf DESC, doc_id, chunk_idx) AS INT) AS rk
          FROM fu)
        SELECT qid, rk, doc_id, chunk_idx, rrf, dense_rk, sparse_rk
        FROM rankedf WHERE rk <= $s10K ORDER BY qid, rk"""

  /** S30 oracle: per-doc chunk counts of the INDEX chain (the cidx
    * CTE, not raw c3 chunks) under the two modular predicates —
    * previous excludes the d11 arrival slice, current excludes the s24
    * tombstones; the diff is the full-outer count comparison. cidx is
    * the row basis by construction (round-17 advice): the engine
    * snapshots [[retrievalIndex]], whose encode drops zero-norm chunks
    * (cn > 0), so an oracle counting raw c3 chunks would diverge the
    * moment any chunk embeds to the zero vector — both sides now share
    * the cn > 0 predicate through the one cidx definition.
    *
    * PINNED CONTRACT (round-18 advice): the post-cn>0 INDEX chain is
    * the INTENDED row basis for version diffs, not an artifact of
    * aligning the oracle to the engine. A version diff answers "what
    * changed in what the store SERVES"; zero-norm chunks are never
    * servable (they cannot score under cosine), so counting them
    * would report phantom adds/removes for rows no query can ever
    * see. If a raw-corpus-chunk diff is ever wanted, it is a NEW
    * operator over c3, not a redefinition of s30. Pinned by
    * SimilaritySpec ("s30 row basis is the served index chain"). */
  private[operators] lazy val s30Sql: String =
    s"""WITH ${cidxCtes()},
        ch AS (
          SELECT doc_id, count(*) AS n
          FROM cidx GROUP BY doc_id),
        prev AS (SELECT doc_id, n FROM ch
                 WHERE doc_id % ${Dedup.d11Mod} != ${Dedup.d11Res}),
        curr AS (SELECT doc_id, n FROM ch
                 WHERE doc_id % $s24DelMod != $s24DelRes)
        SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
          CAST(COALESCE(p.n, 0) AS BIGINT) AS n_prev,
          CAST(COALESCE(c.n, 0) AS BIGINT) AS n_curr,
          CASE WHEN COALESCE(p.n, 0) = 0 THEN 'added'
               ELSE 'removed' END AS change
        FROM prev p FULL JOIN curr c ON p.doc_id = c.doc_id
        WHERE COALESCE(p.n, 0) != COALESCE(c.n, 0)
        ORDER BY 1"""

  /** s19 oracle: the s10 dense serving SQL and the s17 BM25 SQL as
    * leg subqueries (each already an oracled contract of its own
    * gate), fused by the shared RRF tail — the oracle composes the
    * SAME three pieces the engine does. */
  private[operators] lazy val s19Sql: String =
    s"""WITH den AS (
          SELECT qid, doc_id, chunk_idx, rk AS dense_rk FROM ($s10Sql)),
        sp AS (
          SELECT qid, doc_id, chunk_idx, rk AS sparse_rk FROM ($s17Sql)),
        $rrfFuseSqlTail"""

}
