package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** ANN variants + clustering + embedding-health profiling (round-19
  * split, see [[SimilarityBase]]): exact top-k s1, LSH s2/s5, IVF s4,
  * SQ8 s6, PQ-ADC s12, IVF-PQ s13/s14, recall evals s31/s32,
  * deterministic Lloyd k-means s7 + SemDeDup s8/s9 + the s11 centroid
  * refresh, and the prof7/prof8/prof9/prof10 health readouts. */
private[operators] trait SimilarityAnn { this: Similarity.type =>

  /** S1: exact brute-force cosine top-k — queries = vec_id < 10, k = 5
    * nearest others by cosine (desc, id tie-break). The oracle baseline
    * every ANN variant is measured against. */
  val s1CosineTopK: Q = (s, dir) => {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

  /** S2: LSH-bucketed ANN with MULTI-PROBE over the query subset
    * (vec_id < 10) — [[lshAnn]] under the committed 6-plane geometry
    * (its DuckDB oracle embeds the same planes); the probe factor
    * (P+1 of 2^P buckets) is the recall/cost dial, measured vs s1 in
    * the spec. */
  val s2LshAnn: Q = (s, dir) => lshAnn(s, dir, planes,
    queriesOnly = true, k = 3)

  /** S4: IVF-style ANN — inverted-file search with the `label` column's
    * mean vectors as the coarse quantizer: (1) centroid per label
    * (posexplode → per-dim avg → re-assembled array — one shuffle, tiny
    * output), (2) every vector assigned to its nearest centroid by dot
    * product (argmax via ranking window; centroids broadcast), (3) query
    * vectors (vec_id < 10) search ONLY their own cell, exact cosine
    * top-3. At 100 TB the cell restriction is the point: candidate scans
    * shrink by ~|cells|×, recall measured against s1 in the spec. */
  val s4IvfAnn: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label").agg(
        array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("cell"),
        transform(col("pc"), x => x.getField("c")).as("centroid"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc("cdot"), col("cell"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("cdot", graft.functions.Vectors.dot(col("embedding"), col("centroid")))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"),
        normD(col("embedding")).as("nrm"))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell"))
    val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("cell"))
    val wTop = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    q.join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

  /** S5: batch kNN JOIN — EVERY vector joined to its top-3 approximate
    * neighbors (s2's ANN with the query filter removed): the self-join
    * form that embedding-level dedup, cluster seeding, and
    * retrieval-index bootstrap all run over the full corpus. Shape:
    * multi-probe explode on the query side (P+1 of 2^P buckets),
    * candidates from their own bucket only, exact cosine + rank within
    * the probed union. At 100 TB the join never goes all-pairs —
    * candidate volume is Σ_b (probe·n_b)·n_b, and the production entry
    * point derives P from corpus size ([[planesFor]]) so per-bucket
    * occupancy stays flat (the d6 sf1 lesson: occupancy drives
    * candidate volume quadratically; SimilaritySpec measures the tuned
    * geometry's recall against the committed one). The window ranks per
    * qid over its probed candidates only — bounded fan-in, no global
    * sort. The GATED query runs the committed 6-plane geometry its
    * oracle embeds. */
  val s5KnnJoin: Q = (s, dir) => lshAnn(s, dir, planes,
    queriesOnly = false, k = 3)

  /** s5's PRODUCTION geometry as a runnable, measurable entry point:
    * the same [[lshAnn]] core under P = [[planesFor]](n) instead of the
    * committed oracle geometry. ScaleRun runs this as s5's tuned twin,
    * so the scale table MEASURES the claim the fixed-P gated row can't:
    * candidate volume ≈ n·(P+1)·occupancy stays ~linear in n (the
    * round-20 sf10 sweep read the committed P=6 row at 4.6B candidate
    * pairs — the quadratic fixed-geometry signature this dial exists
    * to prevent — vs 1.6B at the tuned P=8). */
  private[graft] def s5TunedGeometry(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "embeddings").count()
    lshAnn(s, dir, planesFor(n), queriesOnly = false, k = 3)
  }

  /** S3: bucket histogram — the LSH load-balance diagnostic (bucket id →
    * vector count). At 100 TB this is the skew check run before choosing P. */
  val s3BucketStats: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select(bucketOf(col("embedding"), planes).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("n_vectors"))
      .orderBy("bkt")

  /** Cluster count / Lloyd iterations of [[s7Kmeans]]. */
  private[operators] val kmeansK = 4
  private[operators] val kmeansIters = 3

  /** S7: K-MEANS EMBEDDING CLUSTERING — deterministic Lloyd's over the
    * corpus embeddings: the semantic-domain grouping step training-data
    * pipelines run for data mixing, per-domain sampling weights, and
    * cluster-level dedup/curation. Init = the first [[kmeansK]] vectors
    * (seed-free, oracle-reproducible); [[kmeansIters]] assign/recompute
    * rounds; output = each vector's final cluster + squared L2 distance.
    *
    * Scale shape (the classic distributed-Lloyd layout): each
    * ASSIGNMENT round is MAP-ONLY — the k centroids travel as ONE
    * broadcast row holding an array of (cell, vec, |c|²) structs, and
    * the per-vector argmin is `array_min` over a `transform` of that
    * array (struct ordering = (distance, cell), so ties break by cell
    * id with no window and NO per-iteration shuffle of the corpus).
    * Each RECOMPUTE round is one map-side-combined aggregation
    * (posexplode → avg per (cell,dim) → k×64 rows). Per iteration at
    * 100 TB: one corpus scan + one combiner-output shuffle — never a
    * window over the crossJoin (which would reshuffle k× the corpus
    * per round). Determinism: centroid components are ROUNDED to 6 dp
    * after each mean (raw avg() is merge-order dependent — see
    * recompute) and distances use the fold-order-pinned FloatVecDot
    * (d = |c|² − 2·v·c, the |v|² constant added only for the output),
    * so both engines rank over the same pinned centroid values.
    * Structure: [[kmeansCentroids]] trains + persists the k-row
    * centroid artifact; [[kmeansAssign]] is the map-only assignment;
    * [[s7Kmeans]] composes the two for the gated output. */
  /** One Lloyd ASSIGNMENT pass of `e` (vec_id, embedding) against a
    * centroid frame (cell, vec, n2): the k centroids collapse to ONE
    * broadcast row of (cell, vec, |c|²) structs and the per-vector
    * argmin is `array_min` over a `transform` of that array (struct
    * ordering = (distance, cell) — ties break by cell id with no window
    * and NO shuffle of `e`). Shared by s7 (gated clustering), s8
    * (semantic dedup) and the d13 streaming cluster tag. */
  private[operators] def kmeansAssign(e: DataFrame,
                                      cent: DataFrame): DataFrame = {
    val cents = cent.groupBy().agg(
      array_sort(collect_list(struct(col("cell"), col("vec"), col("n2"))))
        .as("cs"))
    e.crossJoin(broadcast(cents))
      .withColumn("best", array_min(transform(col("cs"), c =>
        struct(
          (c.getField("n2") -
            lit(2.0) * dotD(col("embedding"), c.getField("vec"))).as("d"),
          c.getField("cell").as("cell")))))
      .select(col("vec_id"), col("embedding"),
        col("best").getField("cell").as("cluster"),
        col("best").getField("d").as("pd"))
  }

  /** FINAL k-means centroids per (session, dir) — the per-corpus
    * clustering ARTIFACT (cell, vec, n2; k rows): trained once by the
    * full Lloyd loop, persisted, and PROBED by every consumer (s7's
    * gated assignment, s8's within-cluster prune, d13's streaming
    * cluster tag) — the d3/d11 persisted-LSH-index lifecycle applied to
    * centroids. Production writes this k-row table next to the corpus
    * snapshot; a session holds it in the [[graft.core.Registry]] with
    * content-fingerprint eviction. */
  private[operators] val centroidReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  /** The full Lloyd loop over a (vec_id, embedding) frame with the
    * init centroids = the rows whose vec_id is in `initIds` (cell
    * label = that vec_id) — factored from the full-corpus artifact so
    * the s11 refresh path can train the same way on the base slice.
    * Centroid components are ROUNDED to 6 dp after each mean: avg()
    * merge order is partition-dependent and differs from DuckDB's
    * fold, so raw means can differ in the last ulp between runs/
    * engines — across 3 chained iterations that ulp could flip a
    * Voronoi-boundary assignment. Rounding pins both engines to the
    * same centroid values (up to the measure-zero case of a mean
    * within 1 ulp of a rounding boundary), making the distance
    * ranking deterministic in practice. */
  private[operators] def withN2(cent: DataFrame): DataFrame =
    cent.withColumn("n2", dotD(col("vec"), col("vec")))

  private[operators] def lloyd(e: DataFrame, initIds: Seq[Long]): DataFrame = {
    val init = withN2(e.filter(col("vec_id").isin(initIds: _*))
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("vec")))
    def recompute(assigned: DataFrame): DataFrame =
      withN2(assigned
        .select(col("cluster").as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("c"))
        .groupBy("cell").agg(
          array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("cell"),
          transform(col("pc"), x => x.getField("c")).as("vec")))
    var cent = init
    (1 to kmeansIters).foreach { _ =>
      cent = recompute(kmeansAssign(e, cent))
    }
    cent
  }

  private[operators] def kmeansCentroids(s: SparkSession,
                                         dir: String): DataFrame =
    centroidReg.getOrCompute(s, dir) {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val df = lloyd(e, 0L until kmeansK.toLong)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** Per-corpus CLUSTER-ASSIGNMENT frame (vec_id, embedding, nrm,
    * cluster, pd) — the second persisted clustering artifact: where
    * [[kmeansCentroids]] is the k-row model, this is the per-vector
    * assignment TABLE a production run writes next to the corpus (the
    * SemDeDup layout stores both). Persisted because its consumers
    * reference it several times per plan (s8's two pair-join sides +
    * verdict frame, s9's profile, s8Banded's four references) — an
    * un-persisted frame re-runs the corpus scan + argmin per
    * reference (round-11 review). */
  private[operators] val assignedReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def kmeansAssigned(s: SparkSession,
                                        dir: String): DataFrame =
    assignedReg.getOrCompute(s, dir) {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val df = kmeansAssign(e, kmeansCentroids(s, dir))
        .withColumn("nrm", normD(col("embedding")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  val s7Kmeans: Q = (s, dir) =>
    kmeansAssigned(s, dir)
      .select(col("vec_id"), col("cluster"),
        round(col("pd") + dotD(col("embedding"), col("embedding")), 6)
          .as("dist2"))
      .orderBy("vec_id")

  /** Cosine prune threshold of [[s8Semdedup]] — d6's committed floor,
    * so the semantic-prune verdicts are directly comparable with the
    * minhash/LSH dedup families on the same corpus. */
  private[operators] val s8Tau = 0.45

  /** Per-cluster occupancy [[kForCorpus]] targets: within-cluster pair
    * volume is Σ_c n_c² ≈ n·occupancy, so the target bounds prune-join
    * cost per corpus vector the same way [[targetOccupancy]] bounds
    * s5's candidate lists. */
  private[operators] val targetClusterSize = 4096L

  /** Data-driven cluster count for the semantic-dedup path:
    * K = ⌈n / targetClusterSize⌉ (SemDeDup runs k ≈ n/10⁴ on
    * billion-scale corpora for exactly this reason). The GATED s8 runs
    * the committed [[kmeansK]] its oracle chain embeds; production
    * clusterings pass this K into the Lloyd loop so the within-cluster
    * pair join stays linear in n at fixed occupancy. */
  private[graft] def kForCorpus(n: Long,
                                occupancy: Long = targetClusterSize): Int = {
    require(n > 0 && occupancy > 0, s"bad tuner inputs n=$n occ=$occupancy")
    math.max(1, math.ceil(n.toDouble / occupancy).toInt)
  }

  /** S8: SEMANTIC DEDUPLICATION (SemDeDup-style cluster-then-prune) —
    * the embedding-level dedup shape large-corpus pipelines run where
    * minhash misses paraphrases: every vector is assigned to its
    * k-means cluster (the PERSISTED [[kmeansCentroids]] artifact — one
    * map-only broadcast-argmin pass, s7's shape), then near-duplicates
    * are pruned WITHIN each cluster by exact cosine ≥ [[s8Tau]] with
    * the deterministic keep rule "lowest vec_id wins": a vector is
    * `prune` iff some same-cluster vector with a smaller id sits at or
    * above the threshold (its would-be keeper), else `keep`. Output per
    * vector: cluster, count of lower-id duplicates, best such cosine,
    * verdict — the per-item decision frame a curation pipeline joins
    * back to the corpus (d8's keep-rule role, semantic edition).
    *
    * Scale shape: the pair join is keyed by CLUSTER — never all-pairs
    * across the corpus — so candidate volume is Σ_c n_c², bounded by
    * n·max_cluster_size. The two guards that keep that bound honest at
    * 100 TB: (1) K scales with the corpus ([[kForCorpus]]: fixed
    * expected occupancy, so the join stays ~n·occupancy at any volume
    * — the gated query runs the committed k=[[kmeansK]] geometry its
    * oracle embeds); (2) SKEW — a pathologically hot cluster (skewed
    * Voronoi cell) makes one join key quadratic, so the production
    * pre-flight is the s3-style occupancy histogram (k rows, one
    * bounded agg) and any cluster over ~4× target occupancy is
    * sub-partitioned before pruning: re-cluster within it (recursive
    * Lloyd on its members) or band it with d6's hyperplane-LSH keyed
    * (cluster, band, sig) — both compose the operators this library
    * already ships, and AQE's skew-join split handles the residual
    * imbalance below that trigger. Exact cosine within clusters is the
    * SemDeDup contract (candidates are bounded by construction, unlike
    * d6's corpus-wide banding which must be probabilistic). */
  /** Shared s8-family verdict assembly over a scored (b, cosine) pair
    * frame: threshold → per-b dup count/best score → every vector's
    * keep/prune verdict row. Factored so the exact and banded paths
    * cannot silently diverge on the keep rule or the output shape. */
  private[operators] def pruneVerdicts(assigned: DataFrame,
                            scored: DataFrame): DataFrame = {
    val prunes = scored
      .filter(col("cosine") >= s8Tau)
      .groupBy("b").agg(count(lit(1)).as("n_dups"),
        max("cosine").as("best_cosine"))
    assigned.select(col("vec_id"), col("cluster"))
      .join(prunes.withColumnRenamed("b", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("best_cosine"),
        when(col("n_dups").isNull, "keep").otherwise("prune").as("verdict"))
      .orderBy("vec_id")
  }

  val s8Semdedup: Q = (s, dir) => {
    val assigned = kmeansAssigned(s, dir)
    val a = assigned.select(col("cluster"), col("vec_id").as("a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    pruneVerdicts(assigned,
      a.join(b, Seq("cluster"))
        .filter(col("a") < col("b"))
        .select(col("b"),
          (dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cosine")))
  }

  /** s8's PRODUCTION clustering as a runnable, measurable entry point:
    * re-cluster at K = [[kForCorpus]](n) (fixed expected occupancy)
    * with the same deterministic Lloyd loop, then the same
    * within-cluster exact prune + keep rule. ScaleRun runs this as
    * s8's tuned twin: pair volume ≈ n·occupancy/2 grows ~linearly in n
    * where the committed-k gated row grows quadratically (the round-20
    * sf10 sweep read the k=4 row at 774 s — 50k-vector clusters —
    * exactly the fixed-geometry signature [[kForCorpus]] prevents).
    * The assignment frame is localCheckpointed for its three
    * references (two join sides + the verdict frame), mirroring the
    * persisted artifact the gated path probes. */
  private[graft] def s8TunedK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val k = kForCorpus(e.count())
    val assigned = kmeansAssign(e, lloyd(e, 0L until k.toLong))
      .withColumn("nrm", normD(col("embedding")))
      .localCheckpoint()
    val a = assigned.select(col("cluster"), col("vec_id").as("a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    pruneVerdicts(assigned,
      a.join(b, Seq("cluster"))
        .filter(col("a") < col("b"))
        .select(col("b"),
          (dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cosine")))
  }

  /** The s8 HOT-CLUSTER sub-partition path as code, not prose — the
    * production variant the skew guard switches to when s9 reports a
    * cluster over the occupancy trigger: candidates come from the
    * (cluster, band, sig) join — d6's hyperplane banding APPLIED WITHIN
    * clusters — so a pathological cluster's pair volume drops from
    * n_c² to Σ_sig n_sig² per band, and the exact cosine rerank + the
    * s8 keep rule run on the bounded candidate set only. Recall is
    * probabilistic exactly as d6's (P(candidate | cos=τ) =
    * 1−(1−p^r)^B), which is why the GATED s8 stays exact-within-cluster
    * (its oracle demands determinism and k bounds its join): this
    * entry point trades the guaranteed verdict for a bounded join on
    * corpora where a cluster cannot be re-clustered first.
    * SimilaritySpec measures the trade: banded prunes ⊆ exact prunes,
    * recall reported and floored. */
  private[graft] def s8Banded(s: SparkSession, dir: String,
      bands: Int = 8, planesPerBand: Int = 4): DataFrame = {
    val assigned = kmeansAssigned(s, dir)
    val bandRows = Dedup
      .d6Banded(assigned.select(col("vec_id"), col("embedding")),
        bands, planesPerBand)
      .join(assigned.select(col("vec_id"), col("cluster")), Seq("vec_id"))
    val cand = bandRows
      .select(col("cluster"), col("band"), col("sig"), col("vec_id").as("a"))
      .join(bandRows.select(col("cluster"), col("band"), col("sig"),
        col("vec_id").as("b")), Seq("cluster", "band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val sides = assigned.select(col("vec_id"), col("embedding"), col("nrm"))
    pruneVerdicts(assigned, cand
      .join(sides.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("a"))
      .join(sides.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("b"))
      .select(col("b"),
        (dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
          .as("cosine")))
  }

  /** S9: CLUSTER-BALANCE PROFILE — the pre-flight the s8 skew guard
    * runs before a semantic-dedup pass (s3's bucket histogram, cluster
    * edition): per cluster, member count, occupancy share, and the
    * dispersion stats (mean / max squared L2 to the centroid). Reads
    * the SAME persisted artifacts as s7/s8 (one map-only assignment
    * pass + one k-row aggregation — bounded output at any corpus
    * size), and its n_vectors column is exactly the n_c of the
    * Σ n_c² pair-volume bound: a cluster whose share breaches the
    * ~4× [[targetClusterSize]] occupancy trigger is sub-partitioned
    * (recursive Lloyd / d6 banding) BEFORE the s8 prune join is
    * launched, and a high mean dist2 flags a cluster too diffuse for
    * within-cluster cosine pruning to mean anything. Determinism:
    * dist2 is rounded per-row to 6 dp (s7's output contract) before
    * the stats; avg re-rounded (same-sign sum — merge order agrees far
    * below 6 dp, the rounding pins the last ulp). */
  val s9ClusterProfile: Q = (s, dir) => {
    val assigned = kmeansAssigned(s, dir)
    val n = assigned.agg(count(lit(1)).as("n_total"))
    assigned
      .select(col("cluster"),
        round(col("pd") + dotD(col("embedding"), col("embedding")), 6)
          .as("dist2"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vectors"),
        round(avg("dist2"), 6).as("avg_dist2"),
        max("dist2").as("max_dist2"))
      .crossJoin(broadcast(n))
      .select(col("cluster"), col("n_vectors"),
        round(col("n_vectors").cast("double") / col("n_total"), 6)
          .as("share"),
        col("avg_dist2"), col("max_dist2"))
      .orderBy("cluster")
  }

  /** Exact-rerank candidate count of [[s6Sq8Ann]]. */
  private[operators] val sq8Candidates = 20

  /** S6: SQ8 COMPRESSED-VECTOR search — the memory-bandwidth leg of the
    * ANN family: every embedding is scalar-quantized to 8 bits per
    * dimension (per-dim min/max trained over the corpus — one bounded-
    * key aggregation, 64 rows, broadcast back), candidates are selected
    * by the INTEGER dot product of the quantized codes, and only the
    * top-[[sq8Candidates]] per query are reranked with exact float
    * cosine. At 100 TB the quantized scan reads 64 B/vector instead of
    * 256 B — the 4× bandwidth saving is why FAISS-style engines keep an
    * SQ8 (or PQ) copy of the corpus — and the exact rerank touches only
    * candidates·queries full vectors.
    *
    * Codes quantize the NORMALIZED vectors so the integer code dot is a
    * cosine (not dot-product) proxy. Determinism: normalization divides
    * by the fold-order-pinned norm (bit-identical in both engines, the
    * same reliance every cosine here makes), min/max and the one
    * rounding are exact double ops (round-half-up equals round-half-away
    * for non-negative codes), and the candidate ordering key is an
    * INTEGER — no fp-summation-order exposure until the final exact
    * rerank, which reuses s1's fold-order-pinned cosine. */
  val s6Sq8Ann: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // Quantize the NORMALIZED vectors: the integer code dot is then a
    // cosine proxy — quantizing raw components would rank by dot product
    // and lose the true cosine top-k whenever norms vary.
    val en = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
      .withColumn("nv",
        transform(col("embedding"), x => x.cast("double") / col("nrm")))
    val stats = en.select(posexplode(col("nv")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("pm"))
      .select(transform(col("pm"), x => x.getField("mn")).as("mns"),
        transform(col("pm"), x => x.getField("mx")).as("mxs"))
    // Centered codes: the stored uint8 code minus the per-dim integer
    // ZERO POINT. Raw uint8 dots are dominated by the offset terms
    // (Σq·q' ≈ 64z² + zb(Σx + Σy) + b²·dot — the per-vector component
    // sums swamp the cosine signal); centering leaves b²·dot ± small
    // integer error, the form FAISS-style SQ8 scans actually compare.
    val q8 = en.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        transform(sequence(lit(1), lit(dims)), i =>
          when(element_at(col("mxs"), i) > element_at(col("mns"), i),
            round(lit(255.0)
              * (element_at(col("nv"), i) - element_at(col("mns"), i))
              / (element_at(col("mxs"), i) - element_at(col("mns"), i)), 0)
              - round(lit(255.0)
                * (lit(0.0) - element_at(col("mns"), i))
                / (element_at(col("mxs"), i) - element_at(col("mns"), i)), 0))
            .otherwise(lit(0.0)).cast("long")).as("q"))
    val q = q8.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("q").as("qq"), col("nrm").as("qn"))
    val c = q8.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("q").as("cq"), col("nrm").as("cn"))
    val wCand = Window.partitionBy("qid").orderBy(desc("qdot"), col("cid"))
    val wTop = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    q.join(c, col("qid") =!= col("cid"))
      .withColumn("qdot", aggregate(
        zip_with(col("qq"), col("cq"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= sq8Candidates)
      .select(col("qid"), col("cid"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

  /** PQ geometry of [[s12PqAnn]]: [[pqM]] subspaces of [[pqSubDims]]
    * contiguous dims each (M·sub = 64), [[pqK]] codes per subspace
    * (k-means codebooks, [[kmeansIters]] Lloyd rounds, first-[[pqK]]
    * init — the s7 determinism contract on each subspace), and
    * [[pqCandidates]] ADC candidates reranked exactly. */
  private[operators] val pqM = 4
  private[operators] val pqSubDims = 16
  private[operators] val pqK = 8
  private[operators] val pqCandidates = 20

  /** Subvector m of an embedding column (1-based contiguous slice —
    * the oracle's `embedding[lo:hi]`). */
  private[operators] def pqSub(m: Int, emb: Column = col("embedding")): Column =
    slice(emb, m * pqSubDims + 1, pqSubDims)

  /** Per-corpus PQ CODEBOOKS (m, cell, vec, n2; M·K rows) — the third
    * persisted clustering artifact: one [[lloyd]] codebook per
    * subspace, trained on the corpus subvectors ([[kmeansCentroids]]'
    * lifecycle: computed once per (session, dir), probed by the encode
    * pass and every query batch). */
  private[operators] val pqBookReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def pqCodebooks(s: SparkSession,
                                     dir: String): DataFrame =
    pqBookReg.getOrCompute(s, dir) {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val df = (0 until pqM).map { m =>
        lloyd(e.select(col("vec_id"), pqSub(m).as("embedding")),
          0L until pqK.toLong)
          .select(lit(m).as("m"), col("cell"), col("vec"), col("n2"))
      }.reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** Per-corpus PQ CODES (vec_id, embedding, nrm, codes; codes =
    * array of [[pqM]] codebook cells) — the compressed corpus copy a
    * FAISS-style deployment stores next to (or instead of) the raw
    * vectors: M bytes/vector here vs 64 B for the s6 SQ8 codes and
    * 256 B raw. Encoding is MAP-ONLY: each subspace's k-row codebook
    * collapses to one broadcast row and the per-vector argmin is the
    * [[kmeansAssign]] array_min form — chained over subspaces, never
    * a shuffle of the corpus. */
  private[operators] val pqCodeReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def pqCodes(s: SparkSession, dir: String): DataFrame =
    pqCodeReg.getOrCompute(s, dir) {
      val cb = pqCodebooks(s, dir)
      var enc = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      (0 until pqM).foreach { m =>
        val one = cb.filter(col("m") === m).groupBy().agg(
          array_sort(collect_list(struct(col("cell"), col("vec"),
            col("n2")))).as(s"cs$m"))
        enc = enc.crossJoin(broadcast(one))
          .withColumn(s"code$m",
            array_min(transform(col(s"cs$m"), c => struct(
              (c.getField("n2")
                - lit(2.0) * dotD(pqSub(m), c.getField("vec"))).as("d"),
              c.getField("cell").as("cell")))).getField("cell"))
          .drop(s"cs$m")
      }
      val df = enc.select(col("vec_id"), col("embedding"),
        normD(col("embedding")).as("nrm"),
        array((0 until pqM).map(m => col(s"code$m")): _*).as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** S12: PRODUCT-QUANTIZATION ANN with ADC (asymmetric distance
    * computation) — the third compression leg of the ANN family and
    * the billion-vector production layout (IVF-PQ): vectors are stored
    * as [[pqM]] codebook cells (M bytes vs s6's 64 B vs 256 B raw),
    * each query computes ONE M·K-entry distance table (subquery-to-
    * centroid distances), candidate scan cost is M table lookups +
    * M-term adds per vector — NO per-candidate float dot at all, the
    * property that lets FAISS-style engines scan 10⁹ codes/query —
    * and only the top-[[pqCandidates]] are reranked with exact float
    * cosine.
    *
    * Scale shape: codebooks and codes are persisted artifacts (train/
    * encode once per corpus snapshot — the encode is map-only); the
    * query batch crossJoins one broadcast M·K-row codebook row to
    * build its distance tables, then scans codes. At 100 TB the scan
    * composes with s4's IVF cell restriction (probe only the query's
    * coarse cells) — the gated form scans all codes so the oracle
    * covers the full ADC ranking. Determinism: codebook components
    * round to 6 dp per Lloyd round ([[lloyd]]), distance-table entries
    * are |c|² − 2·q_m·c (fold-order-pinned FloatVecDot), the
    * candidate ordering key is the M-term left-folded sum of table
    * entries (same association as the oracle's explicit d0+d1+d2+d3),
    * ties by cid, and the rerank reuses s1's pinned cosine. */
  /** Adds the per-query ADC DISTANCE TABLE `dt` (an int-keyed map
    * m·K+cell → d(q_m, centroid): M·K dots per QUERY, zero dots per
    * candidate) to a query frame carrying `qe` — the one block every
    * ADC consumer shares (s12's flat scan, s13/s14's cell-restricted
    * scans), factored so a change to the table contract cannot reach
    * one consumer and miss another (round-13 review). */
  private[operators] def withAdcTable(q: DataFrame, s: SparkSession,
                           dir: String): DataFrame = {
    val one = pqCodebooks(s, dir).groupBy().agg(
      array_sort(collect_list(struct(col("m"), col("cell"), col("vec"),
        col("n2")))).as("cs"))
    q.crossJoin(broadcast(one))
      .withColumn("dt", map_from_arrays(
        transform(col("cs"), c => c.getField("m") * pqK + c.getField("cell")),
        transform(col("cs"), c => c.getField("n2") - lit(2.0)
          * dotD(slice(col("qe"), c.getField("m") * pqSubDims + 1,
            lit(pqSubDims)), c.getField("vec")))))
      .drop("cs")
  }

  /** ADC shortlist + exact rerank over a joined candidate frame
    * (qid, dt, qe, qn × cid, codes, ce, cn): the M-lookup `adist`,
    * the top-[[pqCandidates]] shortlist (ties by cid), exact-cosine
    * top-3 — the shared tail of s12/s13/s14 with the pinned fold
    * order and tie-break contract in ONE place. */
  private[operators] def adcRerank(joined: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCand = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    val wTop = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    joined
      .withColumn("adist", aggregate(sequence(lit(0), lit(pqM - 1)),
        lit(0.0), (acc, mm) => acc
          + element_at(col("dt"), mm * pqK + element_at(col("codes"), mm + 1))))
      .withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= pqCandidates)
      .select(col("qid"), col("cid"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
      .orderBy("qid", "rk")
  }

  val s12PqAnn: Q = (s, dir) => {
    val codes = pqCodes(s, dir)
    val q = withAdcTable(codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn")), s, dir)
    val c = codes.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("codes"))
    adcRerank(q.join(c, col("qid") =!= col("cid")))
  }

  /** Combined IVF-PQ INDEX artifact (vec_id, embedding, nrm, codes,
    * cluster) — the single table a FAISS-style deployment ships: the
    * coarse cell from the persisted k-means assignment
    * ([[kmeansAssigned]]) and the PQ codes from the persisted encode
    * ([[pqCodes]]), joined ONCE per corpus snapshot and persisted.
    * Production writes exactly this layout (cluster-partitioned code
    * lists); re-deriving it per query batch would pay the vec_id join
    * every time. */
  private[operators] val ivfpqReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def ivfpqIndex(s: SparkSession,
                                    dir: String): DataFrame =
    ivfpqReg.getOrCompute(s, dir) {
      val df = pqCodes(s, dir)
        .join(kmeansAssigned(s, dir).select("vec_id", "cluster"),
          Seq("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** S13: IVF-PQ ANN — the two compression layers composed into the
    * billion-vector production config (what FAISS calls IVFx,PQy and
    * every vector store runs at scale): the COARSE quantizer (s7's
    * persisted k-means cells) restricts each query's scan to its own
    * cell — candidate volume drops by ~|cells|× exactly as in s4 —
    * and WITHIN the cell, candidates are ranked by s12's ADC table
    * lookups over 16-byte PQ codes (zero per-candidate float dots),
    * with only the top-[[pqCandidates]] reranked exactly.
    *
    * Scale shape: the [[ivfpqIndex]] artifact is cluster-keyed, so the
    * candidate join shuffles on the CELL (broadcast for a small query
    * batch), never corpus-wide; per query the scan cost is
    * |cell|·(M lookups + M adds) + 20 exact dots. The cell
    * restriction is the recall/cost dial (multi-probe = join on the
    * query's p nearest cells — that is [[s14MultiprobeIvfpq]]; this
    * gated form probes 1 — recall vs the unrestricted s12 measured in
    * the spec). Degenerate case (round-12 ADVICE): a query whose
    * coarse cell holds no OTHER vector gets ZERO output rows here —
    * the inner cluster join plus `qid =!= cid` leaves nothing to rank.
    * That is the single-probe dial at its floor, exactly the case
    * multi-probe exists for: s14 answers such a query from its 2nd
    * cell. Committed data has no singleton cells (s9's occupancy
    * pre-flight is the guard); a production consumer needing
    * every-query-answered runs s14 (or left-marks the miss).
    * Determinism: coarse cells inherit s7's pinned Lloyd; everything
    * else inherits s12's contract. Implemented as [[ivfpqAnn]] at
    * probes = 1: the probe ranking's nearest cell IS the stored
    * assignment (identical distance formula and tie order), so the
    * semantics equal the original stored-cluster join and the oracle
    * is the p=1 instance of the same parameterized SQL. */
  val s13IvfpqAnn: Q = (s, dir) => ivfpqAnn(s, dir, probes = 1)

  /** Probe count of [[s14MultiprobeIvfpq]] — FAISS's `nprobe`: each
    * query scans its [[ivfProbes]] nearest coarse cells instead of
    * only its own. Candidate volume scales linearly with p (p·|cell|
    * ADC terms per query) and buys the recall mass sitting just across
    * the query's Voronoi boundary — the standard IVF recall/cost
    * trade, and the dial whose p=1 floor is s13's documented
    * singleton-cell degenerate case. */
  private[operators] val ivfProbes = 2

  /** S14: MULTI-PROBE IVF-PQ ANN — s13's recall dial as code (round-12
    * verdict item 2): rank the query against ALL [[kmeansK]] coarse
    * centroids (a k-row broadcast, k map-side dots per query — the
    * same |c|²−2·q·c form and (d, cell) tie order as assignment, so
    * probe #1 IS the query's own cell), explode to the [[ivfProbes]]
    * nearest cells, and run s13's ADC + exact-rerank pipeline over the
    * UNION of the probed cells. Voronoi cells are disjoint, so the
    * union needs no candidate dedup — each corpus vector joins through
    * exactly one probe row.
    *
    * Scale shape: identical to s13 — the [[ivfpqIndex]] artifact is
    * cluster-keyed and the candidate join stays on the CELL (query
    * side = batch × p probe rows, broadcast); per-query scan cost is
    * p·|cell|·(M lookups + M adds) + [[pqCandidates]] exact dots.
    * Recall@3 vs exact is spec-measured ≥ the single-probe s13 on the
    * same corpus (a superset candidate pool can only help the exact
    * rerank; the ADC shortlist keeps [[pqCandidates]] slots either
    * way). Determinism: probe ranking reuses the pinned centroid
    * values and fold order (ties by cell id); everything downstream
    * inherits s13's contract. */
  val s14MultiprobeIvfpq: Q = (s, dir) => ivfpqAnn(s, dir, ivfProbes)

  /** Recall cutoff of the s31 eval — the ANN variants' own k (s13/s14
    * emit top-3), so recall@k compares full result lists. */
  private[operators] val s31K = 3

  /** S31: ANN RECALL EVAL — the measurement loop every ANN deployment
    * runs before trusting an index: recall@k of each approximate
    * variant against the exact brute-force ground truth, per query and
    * averaged. Recall was previously a SPEC assertion (s14 ≥ s13); this
    * gates it as a first-class artifact — the number a re-bucket / PQ
    * retrain / probe retune is accepted or rolled back on, computed by
    * composing three already-oracled legs (s1 exact, s13/s14 variants)
    * so the eval itself carries a fully relational oracle. Scale
    * shape: the variants and the ground truth are batch×k frames
    * (corpus-independent after their own serving paths); the recall
    * join is a left-semi on (qid, cid) over those tiny frames and the
    * means are O(variants). At production scale ground truth comes
    * from an exact pass over a SAMPLED query set — exactly this shape
    * with s1's query-window dial widened. */
  /** THE recall tail (one definition for s31 and s32 — round-18
    * review): per-qid |approx ∩ exact| via a left-semi join on
    * `keyCols`, 0-filled over exact's query set, recall = n_hits/k
    * rounded 6dp. Both frames must be unique on keyCols (rank lists
    * are), so the semi-join count IS the intersection size. */
  private[operators] def recallPerQid(approx: DataFrame, exact: DataFrame,
                           keyCols: Seq[String], k: Int): DataFrame = {
    val hits = approx.select(keyCols.map(col): _*)
      .join(exact.select(keyCols.map(col): _*), keyCols, "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    exact.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / k, 6))
  }

  val s31AnnRecall: Q = (s, dir) => {
    val exact = s1CosineTopK(s, dir).filter(col("rk") <= s31K)
      .select(col("qid"), col("cid"))
    def recallOf(approx: DataFrame, name: String): DataFrame =
      recallPerQid(approx, exact, Seq("qid", "cid"), s31K)
        .withColumn("variant", lit(name))
    val rec = recallOf(s13IvfpqAnn(s, dir), "ivfpq_p1")
      .unionByName(recallOf(s14MultiprobeIvfpq(s, dir), s"ivfpq_p$ivfProbes"))
    val means = rec.groupBy("variant")
      .agg(round(avg("recall"), 6).as("mean_recall"))
    rec.join(broadcast(means), Seq("variant"))
      .select(col("variant"), col("qid"), col("n_hits"), col("recall"),
        col("mean_recall"))
      .orderBy("variant", "qid")
  }

  /** S32: POST-EVENT RECALL EVAL — s31's accept/rollback measurement
    * composed with the lifecycle event it exists to adjudicate
    * (round-17 verdict item 3): replay the s26 re-bucket (committed-
    * geometry store → staged planes+1 rebuild → rename-aside swap),
    * then emit the recall frame ENTIRELY off the post-event artifacts.
    * The served leg is [[retrieveTopK]] over the SWAPPED store under
    * the new geometry (s26's serving, verbatim); the ground truth is
    * the brute-force [[exactTwin]] over the SAME swapped store — both
    * legs read one store lineage, so this is the number a deployment
    * accepts or rolls back the re-bucket on, measured where it will
    * serve, not on a parallel in-memory copy. Closes the loop the s31
    * scaladoc names: build → event → measure → accept/rollback.
    * Oracle: s26's serving SQL and the exact (bucketless) variant of
    * the SAME parameterized generator, fused by s31's recall tail —
    * fully relational, the store invisible to results (d17 pattern).
    * Scale shape: the event replay is s26's (one map-only re-encode +
    * one swap, paid per trigger firing); the eval legs are batch×k
    * frames; the exact leg is O(queries × index) BY DESIGN — in
    * production ground truth runs over a SAMPLED query set, exactly
    * this shape with the s10 query window as the sample. */
  val s32PostEventRecall: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s32") { store =>
      // stage ∥ base (the s26 overlap): the planes+1 rebuild stages
      // while the committed-geometry store writes; swap after both
      val (staged, _) = graft.core.Jobs.concurrently {
        graft.sources.Sinks.stageRewrite(s, store,
          rebucketIndex(s, dir), Seq("bkt"))
      } {
        // serving state BEFORE the trigger: committed-geometry index
        writeStore(retrievalIndex(s, dir), store, Seq("bkt"))
      }
      graft.sources.Sinks.commitStagedRewrite(s, store, staged)
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
    val q = s10QueryFrame(s, dir)
    val served = retrieveTopK(q, idx, s26Planes, s10K)
      .select(col("qid"), col("doc_id"), col("chunk_idx"))
    val exact = exactTwin(q, idx)
      .select(col("qid"), col("doc_id"), col("chunk_idx"))
    val rec = recallPerQid(served, exact,
      Seq("qid", "doc_id", "chunk_idx"), s10K)
    val mean = rec.agg(round(avg("recall"), 6).as("mean_recall"))
    rec.crossJoin(broadcast(mean))
      .select(col("qid"), col("n_hits"), col("recall"),
        col("mean_recall"))
      .orderBy("qid")
  }

  /** Shared s13/s14 core — the IVF-PQ serving pipeline with `probes`
    * as the nprobe dial: rank the query against ALL [[kmeansK]] coarse
    * centroids (one broadcast k-row model, k map-side dots per query;
    * the ranking uses assignment's pinned |c|²−2·q·c distance and
    * (d, cell) tie order, so probe #1 IS the query's own cell and
    * probes=1 reproduces the stored-cluster join exactly), explode to
    * the p nearest cells, join candidates on the CELL from the
    * persisted [[ivfpqIndex]], then the shared ADC shortlist + exact
    * rerank ([[adcRerank]]). Voronoi cells are disjoint, so the probed
    * union needs no candidate dedup — each corpus vector joins through
    * exactly one probe row. */
  private[operators] def ivfpqAnn(s: SparkSession, dir: String,
                       probes: Int): DataFrame = {
    val idx = ivfpqIndex(s, dir)
    val cents = kmeansCentroids(s, dir).groupBy().agg(
      array_sort(collect_list(struct(col("cell"), col("vec"), col("n2"))))
        .as("kc"))
    val q = withAdcTable(
      idx.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"))
        .crossJoin(broadcast(cents))
        .withColumn("probe", slice(array_sort(transform(col("kc"), c =>
          struct((c.getField("n2") - lit(2.0)
            * dotD(col("qe"), c.getField("vec"))).as("d"),
            c.getField("cell").as("cell")))), 1, probes))
        .drop("kc"), s, dir)
      .withColumn("cluster",
        explode(transform(col("probe"), p => p.getField("cell"))))
      .drop("probe")
    val c = idx.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"), col("codes"), col("cluster"))
    adcRerank(q.join(c, Seq("cluster")).filter(col("qid") =!= col("cid")))
  }

  /** Arrival slice of the s11 refresh gate (d11's modular-slice
    * rationale: planted duplicates sit at adjacent ids, so a modular
    * cut — unlike an id range — puts real semantic mass in the batch). */
  private[operators] val s11Mod = 7L
  private[operators] val s11Res = 3L

  /** Init ids of the BASE clustering: the lowest [[kmeansK]] vec_ids
    * that are NOT in the arrival slice (the base-corpus analog of
    * s7's first-K init — seed-free, oracle-reproducible). */
  private[operators] val s11InitIds: Seq[Long] =
    Iterator.iterate(0L)(_ + 1).filter(_ % s11Mod != s11Res)
      .take(kmeansK).toSeq

  /** Centroids trained on the BASE corpus only (the model d13-style
    * serving would hold BEFORE the batch arrives) — same Lloyd loop,
    * persisted per (session, dir) like [[kmeansCentroids]]. */
  private[operators] val baseCentroidReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def baseCentroids(s: SparkSession,
                                       dir: String): DataFrame =
    baseCentroidReg.getOrCompute(s, dir) {
      val base = t(s, dir, "embeddings")
        .filter(pmod(col("vec_id"), lit(s11Mod)) =!= lit(s11Res))
        .select(col("vec_id"), col("embedding"))
      val df = lloyd(base, s11InitIds)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** MINI-BATCH CENTROID UPDATE core — the online k-means rule
    * (Bottou/Bengio; the web-scale form in Sculley's web-scale k-means):
    * for each cluster c with n_c assigned base vectors and an arriving
    * batch contributing m_c members with component sums S_c,
    *   new_c = (n_c · old_c + S_c) / (n_c + m_c)
    * — i.e. old_c moves toward the batch mean with learning rate
    * m_c/(n_c+m_c), the count-weighted convex combination. Components
    * round to 6 dp (the [[lloyd]] determinism contract: batch sums are
    * merge-order-dependent in the last ulp; rounding pins both
    * engines). Returns one row per cluster: old vec, new vec, counts. */
  private[operators] def refreshCentroids(cent: DataFrame,
      baseAssigned: DataFrame, batchAssigned: DataFrame): DataFrame = {
    val nBase = baseAssigned.groupBy(col("cluster").as("cell"))
      .agg(count(lit(1)).as("n_base"))
    val mBatch = batchAssigned.groupBy(col("cluster").as("cell"))
      .agg(count(lit(1)).as("n_batch"))
    val batchSums = batchAssigned
      .select(col("cluster").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg(sum(col("v").cast("double")).as("sv"))
    val newPos = cent
      .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "c")))
      .join(nBase, Seq("cell"), "left")
      .join(mBatch, Seq("cell"), "left")
      .join(batchSums, Seq("cell", "pos"), "left")
      .select(col("cell"), col("pos"),
        coalesce(col("n_base"), lit(0L)).as("nb"),
        coalesce(col("n_batch"), lit(0L)).as("mb"),
        col("c"), coalesce(col("sv"), lit(0.0)).as("sv"))
      .withColumn("nc",
        when(col("nb") + col("mb") === 0, round(col("c"), 6))
          .otherwise(round((col("nb") * col("c") + col("sv"))
            / (col("nb") + col("mb")), 6)))
    newPos
      .groupBy("cell")
      .agg(max("nb").as("n_base"), max("mb").as("n_batch"),
        array_sort(collect_list(struct(col("pos"), col("c"), col("nc"))))
          .as("pc"))
      .select(col("cell"), col("n_base"), col("n_batch"),
        transform(col("pc"), x => x.getField("c")).as("old_vec"),
        transform(col("pc"), x => x.getField("nc")).as("new_vec"))
  }

  /** S11: ONLINE CENTROID REFRESH — the operational companion of the
    * d13 streaming cluster tag (round-11 verdict item 3): d13 tags
    * arriving documents against STATIC centroids, so cluster drift
    * silently degrades the tags prof6 would flag; the production
    * pipeline periodically folds the accepted batch into the model
    * with one mini-batch update and re-persists the k-row artifact.
    * The gated instance: centroids trained on the BASE slice
    * (vec_id % [[s11Mod]] != [[s11Res]]), the arrival slice replayed
    * as the batch, one [[refreshCentroids]] update; output per
    * cluster: member counts and the 6-dp-pinned movement summary
    * (shift = L2 distance old→new, n2_new = |new|²).
    *
    * Scale shape: both assignment passes are the map-only broadcast-
    * argmin ([[kmeansAssign]] — no corpus shuffle); the update itself
    * aggregates k×64 rows. Per refresh at 100 TB: one scan of the
    * batch + one of the base (and the base pass's n_c is a k-row
    * statistic a production run persists WITH the centroid artifact,
    * making the refresh O(batch) — the gated form recomputes it for
    * oracle independence). Refresh cadence contract in BASELINE.md.
    * The movement column is exactly what an operator alerts on: shift
    * >> within-cluster dispersion (s9's avg_dist2) means the tag
    * model has drifted and d13 consumers should re-tag. */
  val s11CentroidRefresh: Q = (s, dir) => {
    val isBatch = pmod(col("vec_id"), lit(s11Mod)) === lit(s11Res)
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cent = baseCentroids(s, dir)
    val refreshed = refreshCentroids(cent,
      kmeansAssign(e.filter(!isBatch), cent),
      kmeansAssign(e.filter(isBatch), cent))
    val diff = zip_with(col("new_vec"), col("old_vec"), (a, b) => a - b)
    refreshed
      .select(col("cell").as("cluster"), col("n_base"), col("n_batch"),
        round(sqrt(dotD(diff, diff)), 6).as("shift"),
        round(dotD(col("new_vec"), col("new_vec")), 6).as("n2_new"))
      .orderBy("cluster")
  }

  /** PROF7: EMBEDDING-SPACE drift profile — prof6's PSI applied to the
    * semantic dimension no raw-column monitor sees: the distribution
    * of CLUSTER OCCUPANCY under the served centroid model, reference
    * corpus (s11's base slice) vs arriving batch (its arrival slice).
    * This is the alarm that tells the d13 tagger and s10 server their
    * centroid model has gone stale — s11's `shift` column says the
    * MODEL moved; prof7 says the DATA moved under the model, which is
    * what triggers an s11 refresh (or full s7 retrain) in production.
    * Lives here rather than queries/Profile because it consumes the
    * persisted s11 base-centroid artifact and the shared map-only
    * assignment pass (the d13 co-location argument).
    *
    * Scale shape: both sides assign MAP-ONLY under the broadcast k-row
    * model ([[kmeansAssign]] — no corpus shuffle); the PSI reduction
    * runs on the k-row occupancy frame. Output per cluster: counts,
    * 6-dp shares, the PSI term, and the repeated total (prof6's
    * eps-floor contract via [[graft.queries.Profile.driftEps]]). */
  val prof7EmbeddingDrift: Q = (s, dir) => {
    val eps = graft.queries.Profile.driftEps
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val assigned = kmeansAssign(e, baseCentroids(s, dir))
      .select(col("cluster"),
        (pmod(col("vec_id"), lit(s11Mod)) =!= lit(s11Res)).as("is_ref"))
    val counts = assigned.groupBy("cluster").agg(
      count(when(col("is_ref"), 1)).as("n_ref"),
      count(when(!col("is_ref"), 1)).as("n_cur"))
    val tot = counts.agg(sum("n_ref").as("ref_tot"),
      sum("n_cur").as("cur_tot"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("p", greatest(
        col("n_ref").cast("double") / col("ref_tot"), lit(eps)))
      .withColumn("q", greatest(
        col("n_cur").cast("double") / col("cur_tot"), lit(eps)))
      .withColumn("term",
        (col("q") - col("p")) * log(col("q") / col("p")))
    val psi = terms.agg(round(sum("term"), 6).as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("cluster"), col("n_ref"), col("n_cur"),
        round(col("n_ref").cast("double") / col("ref_tot"), 6)
          .as("ref_share"),
        round(col("n_cur").cast("double") / col("cur_tot"), 6)
          .as("cur_share"),
        round(col("term"), 6).as("psi_term"),
        col("psi"))
      .orderBy("cluster")
  }

  /** PROF10: EMBEDDING OUTLIER PROFILE — the data-quality readout the
    * embedding families assume but nothing yet measures: per-vector L2
    * distance to the corpus centroid plus its z-score over the distance
    * distribution. Encoder faults (zero vectors, NaN-adjacent garbage,
    * wrong-normalization batches) land as distance outliers long
    * before they corrupt an index or a semdedup verdict — this is the
    * pre-flight a deployment runs on every embedding delivery, next to
    * prof7's drift check (prof7 asks "did the distribution move",
    * prof10 asks "which rows are broken"). Centroid = per-dim mean
    * ROUNDED to 6 dp (the kmeansRecomputeSql cross-engine rule — the
    * rounding makes the artifact bit-identical in both engines, so the
    * downstream algebra agrees exactly); distance via the |c|² − 2·e·c
    * + |e|² expansion with [[graft.plans.FloatVecDot]]'s array-order
    * double fold — the exact IEEE order of the oracle's list_sum.
    * Scale shape: the centroid is one map-side partial aggregate
    * (64 doubles per partition — constant-size merge, never a
    * corpus-sized shuffle), broadcast back; distances are map-only;
    * the (mu, sd) reduction is one scalar agg. Nothing all-pairs,
    * nothing driver-side. */
  val prof10EmbeddingOutliers: Q = (s, dir) => {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cent = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(round(avg(col("v").cast("double")), 6).as("c"))
      .groupBy().agg(
        array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(transform(col("pc"), x => x.getField("c")).as("cvec"))
      .withColumn("cn2", dotD(col("cvec"), col("cvec")))
    val d = e.crossJoin(broadcast(cent))
      .withColumn("dist", sqrt(greatest(
        col("cn2") - lit(2.0) * dotD(col("embedding"), col("cvec")) +
          dotD(col("embedding"), col("embedding")), lit(0.0))))
      .select("vec_id", "dist")
    val stats = d.agg(avg("dist").as("mu"), stddev_samp("dist").as("sd"))
    d.crossJoin(broadcast(stats))
      .select(col("vec_id"), round(col("dist"), 6).as("l2_dist"),
        round((col("dist") - col("mu")) / col("sd"), 6).as("z"))
      .orderBy("vec_id")
  }

  /** PROF8: RETRIEVAL-INDEX HEALTH PROFILE — the s9 pre-flight
    * replayed on the LSH serving index: per-bucket occupancy (count +
    * 6-dp share) over the persisted [[retrievalIndex]], global
    * occupancy stats, and the RE-BUCKET TRIGGER readout the s15/s21
    * cadence contracts name — planes_recommended =
    * planesFor(n_chunks) vs the committed plane count, computed by
    * the INTEGER [[planesForCaseSql]] rule in both engines. This is
    * the O(metadata) check a deployment runs per refresh cadence:
    * occupancy answers "is any bucket hot enough to blow the probe
    * cost model" (the Σ n_c² argument from s9), the trigger answers
    * "has corpus growth outrun the geometry" — both BEFORE a query
    * batch pays for it. One keyed count over the cached index (map-
    * side partials, 2^planes-row result), a one-row global aggregate
    * broadcast back; no corpus reshuffle. */
  val prof8IndexHealth: Q = (s, dir) => {
    val occ = retrievalIndex(s, dir).groupBy("bkt")
      .agg(count(lit(1)).as("n_chunks"))
    val tot = occ.agg(sum("n_chunks").as("n_total"),
      count(lit(1)).as("n_buckets"), max("n_chunks").as("max_occ"))
    occ.crossJoin(broadcast(tot))
      .withColumn("share6",
        round(col("n_chunks").cast("double") / col("n_total"), 6))
      .withColumn("planes_committed", lit(planes))
      .withColumn("planes_recommended",
        expr(planesForCaseSql("n_total")).cast("int"))
      .withColumn("rebucket_due",
        (col("planes_recommended") > lit(planes)).cast("int"))
      .select(col("bkt"), col("n_chunks"), col("share6"), col("n_total"),
        col("n_buckets"), col("max_occ"), col("planes_committed"),
        col("planes_recommended"), col("rebucket_due"))
      .orderBy("bkt")
  }

  /** Read-amplification budget of the compaction cadence: a probed
    * bucket reading this many files (or more) per query batch is due
    * for compaction. Base snapshot + up to 3 fold appends = up to 4
    * files/bucket in the gated lifecycle; a fresh compaction resets to
    * 1 — the budget sits between so the gate exercises both verdicts. */
  private[operators] val prof9FileBudget = 3

  /** Fold count of the prof9 fragmentation lifecycle — ONE constant for
    * the engine's batch slicing AND the oracle's slice predicates (a
    * cadence retune in one place would otherwise silently desync
    * files/compact_due across the gate). */
  private[operators] val prof9Parts = 3

  /** PROF9: ON-DISK STORE HEALTH (round-13 verdict item 3) — prof8
    * profiles the logical index (occupancy, re-bucket trigger); this
    * reads the PHYSICAL store the s15/s21 cadence contract actually
    * triggers on: files-per-bucket of the bucket-partitioned on-disk
    * index, straight off a FileSystem listing — O(buckets) METADATA,
    * the check a deployment runs per refresh tick BEFORE any query
    * batch pays the file-listing + task-launch storm. The gated query
    * replays the fragmentation lifecycle (base snapshot + the 3 s15
    * batch-slice appends, each writing exactly one file per touched
    * bucket — the repartition(bkt) write discipline s21 documents),
    * lists the store, and emits per bucket: row count, file count,
    * SIZE in KiB (round-15 verdict item 4 — the quantity operators
    * actually alert on), and compact_due = files ≥
    * [[prof9FileBudget]] — the trigger readout the BASELINE.md cadence
    * contract names, as a query.
    *
    * Oracle-ability: under the gated lifecycle the file count is a
    * DETERMINISTIC function of the data — each of the 4 writes lands
    * one file in bucket b iff its doc slice has a chunk hashing to b —
    * so the oracle RECOMPUTES the listing relationally from the same
    * index CTE chain (presence indicator per write, summed), and the
    * driver's hash gate covers the actual FileSystem-metadata path
    * end-to-end. BYTES are not relationally recomputable, but they ARE
    * content-deterministic (writeStore's in-partition sort pins row
    * order; parquet encoding is a pure function of rows for a fixed
    * Spark version), so the KiB column is gated the s23 way: pinned
    * per scale as golden VALUES, dispatched on the (n_docs, n_pos)
    * key, harvested from two byte-identical fresh-JVM runs (same
    * re-harvest rule as [[s23Goldens]]; a Spark/parquet version bump
    * moves bytes and fails loudly here — re-harvest then). At 100 TB:
    * the listing is one RPC per bucket dir (namenode metadata, sizes
    * included in the same FileStatus), the occupancy count is the
    * prof8 map-side keyed count — no corpus reshuffle, no file
    * opened. */
  val prof9StoreHealth: Q = (s, dir) => {
    import org.apache.hadoop.fs.Path
    val (store, perBucket) = buildStoreVersion(s, dir, "prof9") { store =>
      writeStore(baseRetrievalIndex(s, dir), store, Seq("bkt"))
      s15BatchSlices(s, dir, parts = prof9Parts.toLong).foreach(
        writeStore(_, store, Seq("bkt"), append = true))
      val fs = new Path(store)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // one listStatus per bucket dir — O(buckets) driver-side
      // metadata, the same scale class as the sinks' affected-
      // partition collects; this version dir is immutable once built,
      // so the listing cannot race a later rebuild
      fs.listStatus(new Path(store))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bkt="))
        .map { st =>
          val data = fs.listStatus(st.getPath).filter(f =>
            f.isFile && f.getPath.getName.endsWith(".parquet"))
          val bkt = st.getPath.getName.stripPrefix("bkt=").toLong
          // bytes ride the SAME listing (FileStatus.getLen — no extra
          // RPC); KiB-banded for the readout, deterministic because
          // writeStore's in-partition sort makes file bytes a pure
          // function of content for a fixed Spark/parquet version
          (bkt, data.length.toLong, data.map(_.getLen).sum / 1024L)
        }.toSeq
    }
    import s.implicits._
    val filesDf = perBucket.toDF("bkt", "files", "kib")
    s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
      .groupBy("bkt").agg(count(lit(1)).as("n_chunks"))
      .join(broadcast(filesDf), Seq("bkt"))
      .withColumn("compact_due",
        (col("files") >= prof9FileBudget).cast("int"))
      .crossJoin(broadcast(
        graft.queries.MlQueries.goldenDispatchKey(s, dir)))
      .select(col("n_docs"), col("n_pos"), col("bkt"), col("n_chunks"),
        col("files"), col("kib"), col("compact_due"))
      .orderBy("bkt")
  }

}
