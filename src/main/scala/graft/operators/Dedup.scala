package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable
import graft.functions.Portable.{h60pSql, P}

/** Deduplication operators over `documents` / `embeddings` — the
  * LLM-pipeline dedup battery (SURVEY.md §7.4): exact content hash,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * All hashing uses Portable.h60 (md5-derived) so every stage is
  * re-computable by the DuckDB oracle — Spark's murmur `hash()` would be
  * faster per-row but unverifiable; at 100 TB swap Portable.h60 for
  * `xxhash64` behind a config if profile shows md5 dominating (it does not
  * at bench scale; the shuffle dominates).
  *
  * Expression staging matters here: higher-order array lambdas are
  * interpreted (no whole-stage codegen), and Catalyst inlines single-use
  * aliases — so tokens / shingles / shingle-hashes are staged via
  * withColumn and referenced MANY times downstream. CollapseProject keeps
  * multiply-referenced non-cheap aliases materialized, so `split` and the
  * md5 pass run once per row instead of once per (row × permutation).
  * Measured on d3: ~25s → sub-second at sf0.001.
  *
  * Scale posture per operator:
  *  - exact dedup: one combiner-friendly shuffle on the content hash.
  *  - MinHash: signatures are a pure map stage; LSH banding shuffles on
  *    (band, bandHash) — candidate volume is controlled by band geometry
  *    (B×R), never O(n²).
  *  - SimHash: pure map to a 32-bit signature + 16-bit halves for banding.
  *  - n-gram Jaccard: inverted-index join on shingle hash bounds work by
  *    co-occurring shingles.
  *  - embedding cosine: O(n²) exact verify path; operators.Similarity.s2
  *    is the LSH-bucketed scale path.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  private val wsPat = "\\s+"

  /** Whitespace-normalized lowercase content — the dedup canonical form. */
  private def norm(c: Column): Column =
    regexp_replace(trim(lower(c)), wsPat, " ")

  /** Shingle-hash mixing constants (coprime with prime P). */
  private val (sA, sB, sC) = (48271L, 69621L, 16807L)

  /** Stage tk (tokens), th (mod-P token hashes) and hs (mod-P 3-gram
    * shingle hashes) as materialized columns; downstream expressions
    * reference the staged attribute, not the expression tree.
    *
    * The shingle hash is an ARITHMETIC mix of the three token hashes
    * ((th_i*A + th_i+1*B + th_i+2*C) mod P, each product reduced mod P so
    * nothing exceeds 3e9·1e9 < 2^63) rather than md5 over a concatenated
    * shingle string: one md5 per TOKEN instead of one md5 + string build
    * per SHINGLE — measured ~5x on the signature stage, and identical in
    * the DuckDB oracle. */
  private def withShingleCols(df: DataFrame): DataFrame =
    df.withColumn("tk", split(trim(lower(col("text"))), wsPat))
      .withColumn("th", Portable.h60Array(col("tk"), modP = true))
      .withColumn("hs",
        when(size(col("th")) >= 3,
          Portable.shingleHashes(col("th"), sA, sB, sC))
          .otherwise(array(Portable.h60(norm(col("text"))) % P)))

  /** Stage the native batched MinHash signature (plans.MinHashSig: one
    * pass over hs for all 12 perms) as `sig`, then cheap extractions —
    * without the staging the sig tree would inline 12 times. */
  private def withSig(df: DataFrame): DataFrame =
    df.withColumn("sig", Portable.minhashSig(col("hs"), 12))

  private def minhashCols: Seq[Column] =
    (0 until 12).map(i => element_at(col("sig"), i + 1).as(s"mh$i"))

  /** D1: exact dedup — group by md5 of normalized content; keeper = min
    * doc_id per group, n_copies counts exact duplicates (sf0.1 testdata
    * plants 8). The canonical 100 TB first pass. */
  val d1Exact: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), md5(norm(col("text"))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  /** D2: MinHash signatures — 12 permutations over 3-word shingles, all
    * in-row array math (no shuffle before the presentation sort). */
  val d2MinhashSig: Q = (s, dir) =>
    withSig(withShingleCols(t(s, dir, "documents")))
      .select(col("doc_id") +: minhashCols: _*)
      .orderBy("doc_id")

  /** D3: MinHash-LSH candidate pairs — band the 12-value signature into 4
    * bands × 3 rows, hash each band, self-join on (band, bandHash) →
    * candidate pairs, then verify with exact Jaccard over the distinct
    * shingle-hash sets. Exact dups collide on every band; near-dups with
    * prob 1-(1-j³)⁴. Empty at SFs with no near-dups — correct, not a bug. */
  val d3MinhashLsh: Q = (s, dir) => {
    val sig = withSig(withShingleCols(t(s, dir, "documents")))
      .select(col("doc_id") +: (minhashCols :+
        array_distinct(col("hs")).as("shset")): _*)
    val banded = sig.select(col("doc_id"), col("shset"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          md5(concat_ws(",", col(s"mh${3 * b}"), col(s"mh${3 * b + 1}"),
            col(s"mh${3 * b + 2}"))).as("bh"))): _*)).as("bb"))
      .select(col("doc_id"), col("shset"), col("bb.band"), col("bb.bh"))
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("a"),
      col("shset").as("sa"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("b"),
      col("shset").as("sb"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sa"), col("sb")).distinct()
      .select(col("a"), col("b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("a", "b")
  }

  /** D4: SimHash — 32-bit signature over the staged token-hash array:
    * per bit j, sum ±1 across tokens; bit j = (sum > 0). Output includes
    * the two 16-bit halves (banding keys for a hamming<=1 join by
    * pigeonhole). */
  val d4Simhash: Q = (s, dir) => {
    t(s, dir, "documents")
      .withColumn("tk", split(trim(lower(col("text"))), wsPat))
      .withColumn("th", Portable.h60Array(col("tk"), modP = false))
      .select(col("doc_id"), Portable.simhash32(col("th")).as("simhash"))
      .withColumn("band_lo", col("simhash") % 65536)
      .withColumn("band_hi", shiftright(col("simhash"), 16) % 65536)
      .orderBy("doc_id")
  }

  /** D5: n-gram Jaccard near-dup — inverted-index self-join on shingle
    * hash (only pairs sharing >=1 shingle are scored), exact Jaccard from
    * per-doc distinct-shingle counts; top-20 most-similar pairs with a
    * deterministic tie-break. */
  val d5NgramJaccard: Q = (s, dir) => {
    val docSh = withShingleCols(t(s, dir, "documents"))
      .select(col("doc_id"), explode(array_distinct(col("hs"))).as("shh"))
    val counts = docSh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = docSh.select(col("doc_id").as("a"), col("shh"))
      .join(docSh.select(col("doc_id").as("b"), col("shh")), Seq("shh"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .orderBy(desc("jaccard"), col("a"), col("b"))
      .limit(20)
  }

  /** D6: embedding-cosine near-dup — exact pairwise cosine >= 0.45 over
    * the 64-dim vectors. Flat codegen'd dot products (functions.Vectors):
    * the interpreted zip_with/aggregate form costs ~60s on 2M pairs. */
  val d6EmbeddingCosine: Q = (s, dir) => {
    import graft.functions.Vectors
    val e = t(s, dir, "embeddings").select(
      col("vec_id"), col("embedding"),
      Vectors.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (Vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy(desc("cosine"), col("a"), col("b"))
  }

  // ---------------------------------------------------------------- oracles

  /** Shared DuckDB CTE mirroring withShingleCols: doc_id, tk, th, hs. */
  private val shingleCte =
    s"""b AS (
          SELECT doc_id,
            regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm,
            string_split_regex(trim(lower(text)), '\\s+') AS tk
          FROM documents),
        thc AS (
          SELECT doc_id, norm,
            list_transform(tk, x -> ${h60pSql("x")}) AS th
          FROM b),
        hsc AS (
          SELECT doc_id,
            CASE WHEN len(th) >= 3 THEN
              list_transform(range(1, len(th) - 1),
                i -> ((th[i] * $sA) % $P + (th[i+1] * $sB) % $P
                      + (th[i+2] * $sC) % $P) % $P)
            ELSE [${h60pSql("norm")}] END AS hs
          FROM thc)"""

  private def mhSelSql: String =
    Portable.perms.take(12).zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $P)) AS mh$i"
    }.mkString(",\n            ")

  val queries: Map[String, Q] = Map(
    "d1_exact_dedup" -> d1Exact,
    "d2_minhash_sig" -> d2MinhashSig,
    "d3_minhash_lsh" -> d3MinhashLsh,
    "d4_simhash" -> d4Simhash,
    "d5_ngram_jaccard" -> d5NgramJaccard,
    "d6_embedding_cosine" -> d6EmbeddingCosine,
  )

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
         min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keeper""",
    "d2_minhash_sig" ->
      s"""WITH $shingleCte
          SELECT doc_id,
            $mhSelSql
          FROM hsc ORDER BY doc_id""",
    "d3_minhash_lsh" ->
      s"""WITH $shingleCte,
          sig AS (
            SELECT doc_id, list_distinct(hs) AS shset,
            $mhSelSql
            FROM hsc),
          banded AS (
            SELECT doc_id, shset, u.band,
              CASE u.band
                WHEN 0 THEN md5(mh0 || ',' || mh1 || ',' || mh2)
                WHEN 1 THEN md5(mh3 || ',' || mh4 || ',' || mh5)
                WHEN 2 THEN md5(mh6 || ',' || mh7 || ',' || mh8)
                ELSE md5(mh9 || ',' || mh10 || ',' || mh11) END AS bh
            FROM sig, (SELECT unnest(range(4)) AS band) u),
          cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
              l.shset AS sa, r.shset AS sb
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id)
          SELECT a, b,
            CAST(len(list_intersect(sa, sb)) AS DOUBLE)
              / len(list_distinct(list_concat(sa, sb))) AS jaccard
          FROM cand
          WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
              / len(list_distinct(list_concat(sa, sb))) >= 0.8
          ORDER BY a, b""",
    "d4_simhash" ->
      s"""WITH b AS (
            SELECT doc_id,
              list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                x -> ${Portable.h60Sql("x")}) AS th
            FROM documents),
          s AS (
            SELECT doc_id,
              ${(0 until 32).map(j =>
        s"CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END").mkString(" +\n              ")} AS simhash
            FROM b)
          SELECT doc_id, simhash,
            simhash % 65536 AS band_lo,
            (simhash >> 16) % 65536 AS band_hi
          FROM s ORDER BY doc_id""",
    "d5_ngram_jaccard" ->
      s"""WITH $shingleCte,
          ds AS (
            SELECT DISTINCT doc_id, unnest(list_distinct(hs)) AS shh
            FROM hsc),
          counts AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
          pairs AS (
            SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
            FROM ds l JOIN ds r ON l.shh = r.shh AND l.doc_id < r.doc_id
            GROUP BY 1, 2)
          SELECT p.a, p.b,
            CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter) AS jaccard
          FROM pairs p
          JOIN counts ca ON p.a = ca.doc_id
          JOIN counts cb ON p.b = cb.doc_id
          ORDER BY jaccard DESC, p.a, p.b LIMIT 20""",
    "d6_embedding_cosine" ->
      """WITH e AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM embeddings)
         SELECT a.vec_id AS a, b.vec_id AS b,
           list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.nrm * b.nrm) >= 0.45
         ORDER BY cosine DESC, a, b""",
  )
}
