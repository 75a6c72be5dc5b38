package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** The chunk-retrieval serving stack (round-19 split, see
  * [[SimilarityBase]]): the persisted bucket-keyed retrieval index and
  * its probe-join serving (s10/s20/s22), the s15 fold, the learned
  * embedder legs s23/s28, the banded layout s25/s29, streaming deletes
  * s27, the re-bucket rebuild s26, and the version diff s30. */
private[operators] trait SimilarityRetrieval { this: Similarity.type =>

  /** Top-k of [[s10Retrieve]]; query set = documents with
    * doc_id < [[s10QueryDocs]], query text = the document's first
    * [[s10QueryTokens]] whitespace tokens (a corpus-prefix query set:
    * deterministic, and guaranteed to have relevant chunks to find). */
  private[operators] val s10K = 5
  private[operators] val s10QueryDocs = 8
  private[operators] val s10QueryTokens = 12

  /** Chunk token-hash array → feature-hashing embedding (plans
    * .HashEmbed over the shared h60 domain). The "embedder" every
    * retrieval deployment swaps in a learned model for — here a
    * deterministic hashing-trick text embedding (±1 per token on
    * dimension h % 64), chosen because it is (a) vocabulary-free and
    * corpus-independent like a real embedding service, (b) computable
    * by the DuckDB oracle, so the WHOLE serving path — corpus build,
    * indexing, probe, rerank, provenance — sits inside the hash gate,
    * and (c) integer-valued, so candidate cosines compare EXACTLY
    * across engines. The Spark-side plumbing (index artifact schema,
    * bucket probe, rerank join) is unchanged when a real embedder
    * replaces it. */
  private[operators] def embedTokens(tokens: Column): Column =
    Portable.hashEmbed(Portable.h60Array(tokens, modP = true), dims)

  /** The RETRIEVAL INDEX artifact over the c3 chunk corpus: each chunk
    * embedded, normed, and LSH-bucketed under the committed plane
    * geometry, persisted per (session, dir) with the [[graft.core
    * .Registry]] lifecycle every silver stage here follows. This is
    * the table a production retrieval deployment WRITES once per
    * corpus snapshot (bucketed/partitioned by `bkt`) and serves every
    * query batch from — the read-side counterpart of c3's build side.
    * Zero-norm chunks (a hash-embedding artifact of token-sign
    * cancellation; measure-zero in practice) are excluded at build
    * time in both engines — they cannot be cosine-ranked. */
  private[operators] val retrievalReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  /** The index ENCODE step — embed, norm-filter, bucket, project — as
    * a per-chunk map over any chunk frame. Factored out so the
    * incremental refresh (s15) encodes ONLY the arriving batch: unlike
    * centroids (s11), nothing here depends on corpus statistics, so
    * fold-in is a pure per-row encode + append and the refreshed index
    * is row-identical to a full rebuild (the spec asserts it). */
  private[operators] def encodeChunks(chunks: DataFrame,
                           nPlanes: Int = planes): DataFrame =
    chunks
      .withColumn("ce", embedTokens(split(col("chunk_text"), " ")))
      .withColumn("cn", normD(col("ce")))
      .filter(col("cn") > 0)
      .withColumn("bkt", bucketOf(col("ce"), nPlanes))
      .select(col("doc_id"), col("chunk_idx"), col("source"),
        col("quality_score"), col("chunk_text"), col("ce"), col("cn"),
        col("bkt"))

  private[operators] def retrievalIndex(s: SparkSession,
                                        dir: String): DataFrame =
    retrievalReg.getOrCompute(s, dir) {
      val df = encodeChunks(TextAnalysis.queries("c3_chunk_corpus")(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** Corpus-prefix query-embedding frame over an arbitrary doc window
    * (first [[s10QueryTokens]] whitespace tokens of each query doc
    * through the same embedder) — ONE recipe for both gated windows,
    * the Scala twin of the parameterized [[s10SqlFor]]: a change to
    * the embedding recipe cannot reach one gate and miss the other. A
    * production serving path binds this to the incoming query batch
    * instead. */
  /** First-[[s10QueryTokens]]-whitespace-tokens array of a documents
    * row — THE query-text recipe, shared by the dense embedder
    * ([[queryFrame]]) and the sparse token probe ([[s16SparseLeg]]) so
    * a recipe change cannot desynchronize the hybrid legs. */
  private[operators] def queryTokenArray: Column =
    slice(split(trim(col("text")), "\\s+"), 1, s10QueryTokens)

  private[operators] def queryFrame(s: SparkSession, dir: String,
                         docWindow: Column): DataFrame =
    t(s, dir, "documents").filter(docWindow)
      .select(col("doc_id").as("qid"),
        embedTokens(queryTokenArray).as("qe"))
      .withColumn("qn", normD(col("qe")))
      .filter(col("qn") > 0)

  /** The s10 gated query frame: doc_id < [[s10QueryDocs]]. */
  private[graft] def s10QueryFrame(s: SparkSession, dir: String): DataFrame =
    queryFrame(s, dir, col("doc_id") < s10QueryDocs)

  /** Serving core: ANN candidates via the multi-probe bucket join,
    * exact cosine rerank, top-k per query with chunk text + provenance.
    * `indexPlanes` is the PLANE COUNT THE INDEX WAS BUCKETED WITH —
    * query buckets are computed under the same geometry
    * (bucketOf(qe, indexPlanes)), and the probe set is every bucket
    * within hamming `radius` of the query's own ([[probeMasks]];
    * default radius 1 — s20 dials 2). Passing a value
    * other than the index's own plane count would bucket the two sides
    * in different keyspaces and silently collapse recall to ~0, so a
    * production caller derives BOTH from one planesFor(n_chunks) call
    * at index-build time and stores it with the artifact.
    *
    * Scale shape — the property the whole operator exists for: the
    * CORPUS SIDE NEVER RESHUFFLES PER QUERY BATCH. The index is read
    * straight off its persisted bucket-keyed artifact and the query
    * side (batch × (p+1) probe rows — serving-batch-sized) is
    * broadcast, so the candidate join is a BroadcastHashJoin with the
    * corpus streaming in place; the only exchange after the scan is
    * the per-query rank window over candidates (≈ probes · bucket
    * occupancy per query — with [[planesFor]] occupancy is flat in
    * corpus size, so per-query serving cost is corpus-size-invariant).
    * The rerank is exact cosine within the probed union (s2's
    * contract); recall vs the exact twin is measured in
    * SimilaritySpec, the s2-vs-s1 pattern. */
  /** Probe-mask set of an LSH serving call: every bucket id within
    * hamming distance ≤ `radius` of the query's own — the XOR masks
    * {0} ∪ {2^i} ∪ (radius ≥ 2) {2^i|2^j, i<j}. Distinct masks XOR a
    * bucket to distinct buckets, so the probed union is duplicate-free
    * regardless of radius. ONE generator for the engine fold and the
    * oracle literal ([[probeMasksSqlFor]]) — the [[probeMasksSql]]
    * derivation rationale, now parameterized: the committed dial
    * values are radius 1 (s10, 1+p probes) and radius 2 (s20,
    * 1+p+p(p-1)/2 — 22 at the committed 6-plane geometry). */
  private[operators] def probeMasks(p: Int, radius: Int): Seq[Long] = {
    require(radius >= 1 && radius <= 2, s"unsupported probe radius $radius")
    val h1 = (0 until p).map(i => 1L << i)
    val h2 = if (radius < 2) Seq.empty[Long]
      else for { i <- 0 until p; j <- (i + 1) until p }
        yield (1L << i) | (1L << j)
    0L +: (h1 ++ h2)
  }

  private[graft] def retrieveTopK(q: DataFrame, idx: DataFrame,
                                  indexPlanes: Int, k: Int,
                                  radius: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val masks = probeMasks(indexPlanes, radius).map(lit)
    val qp = q
      .withColumn("bkt0", bucketOf(col("qe"), indexPlanes))
      .withColumn("bkt",
        explode(array(masks.map(m => col("bkt0").bitwiseXOR(m)): _*)))
      .select(col("qid"), col("qe"), col("qn"), col("bkt"))
    val w = Window.partitionBy("qid")
      .orderBy(desc("cosine"), col("doc_id"), col("chunk_idx"))
    idx.join(broadcast(qp), Seq("bkt"))
      .select(col("qid"), col("doc_id"), col("chunk_idx"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"),
        col("source"), col("quality_score"), col("chunk_text"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("chunk_idx"),
        col("cosine"), col("source"), col("quality_score"),
        col("chunk_text"))
      .orderBy("qid", "rk")
  }

  /** S10: RAG RETRIEVAL SERVING — the read side of the corpus this
    * engine builds (round-11 verdict item 1): given a query-embedding
    * frame, return the top-[[s10K]] chunks of the c3 retrieval corpus
    * with text + provenance (source doc, chunk index, quality score).
    * Composes the shipped pieces end-to-end: c3's chunk corpus →
    * [[retrievalIndex]] (persisted, bucket-keyed) → multi-probe LSH
    * candidates → exact cosine rerank → top-k per query. The gated
    * instance runs the committed 6-plane geometry its oracle embeds;
    * production passes [[planesFor]](n_chunks). */
  val s10Retrieve: Q = (s, dir) =>
    retrieveTopK(s10QueryFrame(s, dir), retrievalIndex(s, dir),
      planes, s10K)

  /** Exact brute-force twin of [[s10Retrieve]] (no bucket restriction)
    * — the spec-side recall oracle, s1's role for the chunk domain.
    * Not in the registry: O(queries × chunks), the baseline the ANN
    * path is measured against. */
  private[graft] def s10ExactTwin(s: SparkSession, dir: String,
                                  idxFilter: Column = lit(true)): DataFrame =
    exactTwin(s10QueryFrame(s, dir), retrievalIndex(s, dir).filter(idxFilter))

  /** Brute-force exact top-[[s10K]] for ANY (query frame, index) pair —
    * no bucket restriction; the recall oracle every served path is
    * measured against (s10's hash-embedded index, s23's learned one). */
  private[graft] def exactTwin(q: DataFrame, idx: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid")
      .orderBy(desc("cosine"), col("doc_id"), col("chunk_idx"))
    idx
      .crossJoin(broadcast(q))
      .select(col("qid"), col("doc_id"), col("chunk_idx"),
        (dotD(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= s10K)
      .select(col("qid"), col("rk"), col("doc_id"), col("chunk_idx"),
        col("cosine"))
      .orderBy("qid", "rk")
  }

  /** Per-store-ROOT monitors for the lifecycle gates (s21/s24/s25/
    * s26/prof9/s27): builds of the same root serialize (two concurrent
    * identical rebuilds would only burn CPU — content is a pure
    * function of the source dir; different gates / source dirs stay
    * independent — the stagingLocks rationale in Streams). Reader
    * safety does NOT ride on this lock: [[buildStoreVersion]] gives
    * every invocation its own immutable store version with
    * previous-version retention, so a LAZY serving frame returned
    * before a later rebuild keeps reading its own snapshot (round-15
    * advice closed: the old wipe-in-place protocol documented a
    * single-concurrent-consumer contract it could not enforce). */
  private[operators] val storeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[operators] def withStoreLifecycle[T](store: String)(body: => T): T =
    storeLocks.computeIfAbsent(store, _ => new Object).synchronized(body)

  /** S27: STREAMING DELETE INGEST — the operational arrival path of
    * s24's tombstones: in production, deletes are CDC/curation EVENTS,
    * not a frame someone hands the compactor, so this gate replays the
    * s24 delete set as a genuinely multi-batch AvailableNow stream
    * (2-file staging, maxFilesPerTrigger = 1 — the d12 harness) whose
    * foreachBatch ACCUMULATES arrivals into a tombstone side table
    * (idempotent batch=<id> overwrite subdirs — at-least-once retries
    * cannot duplicate a batch, and the fold's distinct makes duplicate
    * tombstone ROWS harmless anyway), then folds the accumulated set
    * at the next compaction and serves from the folded store. No
    * per-event store work: a delete costs one tiny append at arrival
    * and rides the compaction rewrite at cadence — the same
    * amortization s24 pins, now with the arrival leg real. Oracle =
    * [[s24Sql]] verbatim: tombstone folding is batch-split invariant
    * (the union of arrivals is the delete set), the d12-reuses-d11
    * relationship replayed on the delete dimension. */
  val s27StreamDelete: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s27") { store =>
      writeStore(baseRetrievalIndex(s, dir), store, Seq("bkt"))
      writeStore(encodedBatch(s, dir), store, Seq("bkt"), append = true)
      val tomb = s24Tombstones(s, dir)
      val fp = graft.core.Tables.sourceFingerprint(s"$dir/documents.parquet")
      // staging key carries the delete-rule constants (a retuned rule
      // must not replay an old set); the shared harness (the d12/d13
      // one) adds pid + _SUCCESS staging, the per-call idempotent
      // batch=<id> sink, and PlanEvidence recording of the arrival leg
      val arrived = graft.streaming.Streams.replayForeachBatch(s,
        tomb.repartitionByRange(2, col("doc_id")),
        s"tomb-$fp-${s24DelMod}m$s24DelRes", shape = "r2",
        tag = "s27_stream_delete")(identity)
      // an empty delete set streams zero micro-batches and the harness
      // returns the empty frame: compact without tombstones (nothing
      // to fold — compactPartitioned's empty-fold guard must not fire)
      val any = !arrived.limit(1).isEmpty
      graft.sources.Sinks.compactPartitioned(s, store, Seq("bkt"),
        if (any) Some(arrived.select(col("doc_id"))) else None,
        if (any) Seq("doc_id") else Nil)
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
    retrieveTopK(s15QueryFrame(s, dir), idx, planes, s10K)
  }

  /** One-plane-up geometry of the s26 re-bucket gate: planes+1 is
    * EXACTLY the action [[prof8IndexHealth]]'s rebucket_due prescribes
    * — when corpus growth pushes planesFor(n_chunks) past the stored
    * plane count it crosses by one power of two, so the rebuild adds
    * one plane (halving expected occupancy back to target). */
  private[operators] val s26Planes = planes + 1

  /** The index REBUILT under the new geometry — the offline job the
    * re-bucket trigger hands off to (s7-retrain's analog): a full
    * re-encode of the corpus with one more sign plane. Embeddings and
    * norms are unchanged (the embedder is geometry-independent); only
    * the bucket key is recomputed, so the rebuild is the same map-only
    * encode pass as the original build. Persisted per (session, dir);
    * the GATE writes it through the on-disk store path and swaps
    * (see [[s26RebucketRebuild]]) — this frame is the staged content
    * and the spec's ground truth for the swapped store. */
  private[operators] val rebucketReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[graft] def rebucketIndex(s: SparkSession, dir: String): DataFrame =
    rebucketReg.getOrCompute(s, dir) {
      val df = encodeChunks(
        TextAnalysis.queries("c3_chunk_corpus")(s, dir), s26Planes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** S26: RE-BUCKET REBUILD — the ACTION leg of prof8's re-bucket
    * trigger, closing the last open loop of the index lifecycle
    * (build → refresh → compact → delete → RE-BUCKET): rebuild the
    * chunk index under planes+1, commit it THROUGH THE ON-DISK STORE
    * PATH (round-15 verdict item 1), and serve the s10 query window
    * FROM THE SWAPPED STORE through the SAME [[retrieveTopK]] with the
    * new geometry on BOTH sides (query buckets and probe masks derive
    * from the index's own plane count — the keyspace contract
    * retrieveTopK documents). The gate replays the full production
    * sequence: the bucket-partitioned store a deployment holds under
    * the COMMITTED geometry (what its readers are pruning on when the
    * trigger fires), then the rebuild staged aside and committed by
    * [[graft.sources.Sinks.rewritePartitioned]] — the same checked
    * rename-aside protocol as compaction, which is exactly where a
    * geometry swap earns it: the `bkt=` directory set itself changes,
    * so a partition-pruned reader must see old or new geometry
    * atomically, never a mix (SinksSpec pins sibling survival and the
    * mid-swap states; SimilaritySpec pins store ≡ rebuilt index).
    * Oracle = the s10 serving SQL with nPlanes = 7 through the SAME
    * parameterized generators (bucketSql/probeMasks) — the store must
    * be invisible to results, the plane count the only semantic diff
    * from s10. Scale shape: the rebuild is one map-only encode pass +
    * one store write (the original build's cost — paid once per
    * trigger firing, amortized over the growth that fired it); serving
    * cost per query RETURNS to target occupancy — probes·occupancy
    * halves back, which is the entire point of the trigger. */
  val s26RebucketRebuild: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s26") { store =>
      // the re-bucket rebuild STAGES CONCURRENTLY with the committed-
      // geometry store write (guide §2.6; production reality — the
      // offline re-encode runs while the old store serves): the staged
      // dir is a sibling path, so the two writes never collide, and
      // the swap commits only after both complete
      val (staged, _) = graft.core.Jobs.concurrently {
        // the re-bucket ACTION's stage: the planes+1 re-encode aside
        graft.sources.Sinks.stageRewrite(s, store,
          rebucketIndex(s, dir), Seq("bkt"))
      } {
        // the store serving holds BEFORE the trigger fires: the
        // committed-geometry index under the s21 bucket layout
        writeStore(retrievalIndex(s, dir), store, Seq("bkt"))
      }
      // the swap commit (rename-aside, crash-safe)
      graft.sources.Sinks.commitStagedRewrite(s, store, staged)
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
    retrieveTopK(s10QueryFrame(s, dir), idx, s26Planes, s10K)
  }

  // ------------------------------------------------------------------ //
  // s23: learned embedder behind the SAME serving stack
  // ------------------------------------------------------------------ //

  /** The TRAINED embedder at the [[embedTokens]] swap point (round-13
    * verdict item 1): a seeded MLlib Word2Vec fit on the c3 chunk
    * corpus — the production move every retrieval deployment makes
    * when the hashing-trick stand-in is replaced by a learned model.
    * Fit once per (session, dir) via the registry; determinism is
    * pinned the m3/m7 way: the training sentences are repartition(1) +
    * in-partition (doc_id, chunk_idx) sorted + persisted before the
    * fit, and the fit runs single-partition with a fixed seed, so
    * vocabulary order and the SGD stream are content-deterministic and
    * the fitted vectors (and the s23 golden top-k) reproduce across
    * hosts and input layouts. The m7 BLAS caveat applies identically
    * (MLlib's axpy rides netlib; a native-BLAS host could drift a low
    * bit — the spec pins in-session refit equality so such a failure
    * is diagnosable as fit nondeterminism, not serving plumbing).
    * minCount 2 (not the default 5): the sf0.001 corpus is small and a
    * tiny vocabulary would zero out most chunk embeddings. */
  private[operators] val w2vReg =
    new graft.core.Registry[org.apache.spark.ml.feature.Word2VecModel](_ => ())

  /** The raw fit — exposed (bypassing the registry cache) so the spec
    * can pin in-session refit determinism: two fits over the same
    * content must produce identical vectors. */
  private[graft] def fitLearnedEmbedder(
      s: SparkSession, dir: String): org.apache.spark.ml.feature.Word2VecModel = {
    val sents = TextAnalysis.queries("c3_chunk_corpus")(s, dir)
      .select(col("doc_id"), col("chunk_idx"),
        split(col("chunk_text"), " ").as("toks"))
      .repartition(1).sortWithinPartitions("doc_id", "chunk_idx")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sents.count()
    try {
      new org.apache.spark.ml.feature.Word2Vec()
        .setInputCol("toks").setOutputCol("we")
        .setVectorSize(dims).setSeed(42L)
        .setNumPartitions(1).setMaxIter(1).setMinCount(2)
        .fit(sents)
    } finally sents.unpersist(false)
  }

  private[operators] def learnedEmbedder(
      s: SparkSession, dir: String): org.apache.spark.ml.feature.Word2VecModel =
    w2vReg.getOrCompute(s, dir)(fitLearnedEmbedder(s, dir))

  /** The learned-metric RETRIEVAL INDEX — [[encodeChunks]]'s exact
    * shape (embed → norm-filter → bucket under the committed plane
    * geometry) with the Word2Vec transform in the embedder slot,
    * persisted per (session, dir). Everything downstream — the bucket
    * probe, [[retrieveTopK]], provenance — is UNTOUCHED: the point of
    * the gate is that the serving stack is embedder-agnostic in code,
    * not prose. Zero-norm chunks (every token OOV) are excluded at
    * build time like the hash path's sign-cancelled ones. */
  private[operators] val learnedIdxReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[graft] def learnedIndex(s: SparkSession, dir: String): DataFrame =
    learnedIdxReg.getOrCompute(s, dir) {
      val m = learnedEmbedder(s, dir)
      val df = m.transform(
          TextAnalysis.queries("c3_chunk_corpus")(s, dir)
            .withColumn("toks", split(col("chunk_text"), " ")))
        .withColumn("ce",
          org.apache.spark.ml.functions.vector_to_array(col("we")))
        .withColumn("cn", normD(col("ce")))
        .filter(col("cn") > 0)
        .withColumn("bkt", bucketOf(col("ce"), planes))
        .select(col("doc_id"), col("chunk_idx"), col("source"),
          col("quality_score"), col("chunk_text"), col("ce"), col("cn"),
          col("bkt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** The s10 query window through the LEARNED embedder — same
    * [[queryTokenArray]] recipe, same norm filter; only the embedder
    * differs from [[s10QueryFrame]]. */
  private[graft] def s23QueryFrame(s: SparkSession, dir: String): DataFrame =
    learnedEmbedder(s, dir).transform(
        t(s, dir, "documents").filter(col("doc_id") < s10QueryDocs)
          .select(col("doc_id").as("qid"), queryTokenArray.as("toks")))
      .withColumn("qe",
        org.apache.spark.ml.functions.vector_to_array(col("we")))
      .withColumn("qn", normD(col("qe")))
      .filter(col("qn") > 0)
      .select(col("qid"), col("qe"), col("qn"))

  /** S23: LEARNED-EMBEDDING RETRIEVAL SERVING — the s10 serving path
    * with a TRAINED embedder in the swap slot: fit (once, registry) →
    * index under the same committed plane geometry → the SAME
    * [[retrieveTopK]] multi-probe + exact-rerank join. Gated the
    * m7/u14 way: fitted vectors aren't SQL-recomputable, but the fit
    * is content-deterministic (see [[learnedEmbedder]]), so the
    * BOUNDED per-qid top-k id frame (8 qids × 5 ranks) is a stable
    * golden pinned per scale as VALUES and dispatched on the
    * (n_docs, n_pos) key DuckDB recomputes through the m6 chain.
    * Ranks only — cosines under trained vectors stay engine-side;
    * recall vs the exact twin under the learned metric and in-session
    * refit determinism live in SimilaritySpec.
    * Scale shape: identical to s10 (the entire point) — corpus side
    * never reshuffles per batch, broadcast probes, flat occupancy
    * under planesFor; the fit itself is the one new cost, paid once
    * per corpus snapshot like any index build. */
  val s23LearnedEmbed: Q = (s, dir) =>
    retrieveTopK(s23QueryFrame(s, dir), learnedIndex(s, dir), planes, s10K)
      .select(col("qid"), col("rk"), col("doc_id"), col("chunk_idx"))
      .crossJoin(broadcast(
        graft.queries.MlQueries.goldenDispatchKey(s, dir)))
      .select(col("n_docs"), col("n_pos"), col("qid"), col("rk"),
        col("doc_id"), col("chunk_idx"))
      .orderBy("qid", "rk")

  /** The s23 learned-dense serving top-k as a fusion leg — the
    * [[s10DenseLeg]] shape with the TRAINED embedder's index/query
    * frames in the dense slot; shared by [[s28LearnedHybrid]] and its
    * spec (which recomputes the fusion from this leg's own output). */
  private[operators] def s23DenseLeg(s: SparkSession,
                                     dir: String): DataFrame =
    retrieveTopK(s23QueryFrame(s, dir), learnedIndex(s, dir), planes,
      s10K)
      .select(col("qid"), col("doc_id"), col("chunk_idx"),
        col("rk").as("dense_rk"))

  /** S28: LEARNED-DENSE + BM25 HYBRID (round-15 verdict item 2) — the
    * full production retrieval stack with the TRAINED embedder: s19's
    * RRF fusion with s23's learned index/query frames in the dense
    * slot and the unchanged BM25 sparse leg (s17). One variable vs
    * each neighbor gate: vs s19, the dense leg's embedder (hashing
    * trick → trained Word2Vec); vs s23, the fusion added — so the
    * embedder-agnostic claim now covers the COMPOSED stack, not just
    * the dense serving path. Oracle = the s23 golden-dispatch pattern:
    * fusion is pure rank arithmetic over two deterministic legs
    * (dense ranks content-deterministic per [[learnedEmbedder]],
    * sparse ranks integer-exact), so the bounded per-qid fused top-k
    * — WITH each leg's contributing rank, nulls where a leg missed —
    * is a stable golden pinned per scale and dispatched on the
    * (n_docs, n_pos) key; the rrf double stays engine-side (derivable
    * from the pinned ranks; the spec recomputes it). Scale shape: both
    * legs are the already-measured serving paths; fusion joins two
    * batch×[[s10K]]-row frames — corpus-independent. */
  val s28LearnedHybrid: Q = (s, dir) =>
    rrfFuse(s23DenseLeg(s, dir),
      s17Bm25(s, dir)
        .select(col("qid"), col("doc_id"), col("chunk_idx"),
          col("rk").as("sparse_rk")))
      .select(col("qid"), col("rk"), col("doc_id"), col("chunk_idx"),
        col("dense_rk"), col("sparse_rk"))
      .crossJoin(broadcast(
        graft.queries.MlQueries.goldenDispatchKey(s, dir)))
      .select(col("n_docs"), col("n_pos"), col("qid"), col("rk"),
        col("doc_id"), col("chunk_idx"), col("dense_rk"),
        col("sparse_rk"))
      .orderBy("qid", "rk")

  /** Metadata floor of the s22 filtered-retrieval gate (chunk
    * quality_score ≥ this; the c1 floor is 0.5, so the index retains a
    * real spread above it — τ=0.6 keeps ~80% of chunks at sf0.01).
    * Exact-double threshold compares are the proven c1-floor pattern:
    * both engines compute quality_score by the same fold, so the
    * comparison is bit-identical. */
  private[operators] val s22QualityFloor = 0.6

  /** S22: FILTERED RETRIEVAL — metadata-constrained ANN serving, the
    * standard production "filtered vector search" (retrieve only
    * chunks whose quality clears a floor / whose metadata matches the
    * request). PRE-filter semantics: the predicate restricts the
    * CANDIDATE set before ranking, so every returned rank is the best
    * of the allowed domain and k slots fill whenever the filtered
    * domain has k probed candidates — post-filtering a generic top-k
    * would silently return < k and leak excluded-domain ranks. The
    * filter composes with the serving join as a map-side predicate on
    * the persisted index scan (no new shuffle, no rebuild — the same
    * artifact serves filtered and unfiltered queries; a deployment
    * with a STABLE filter taxonomy would partition the store by the
    * filter column instead, the s21 layout argument). Oracle = the
    * s10 serving SQL with the same predicate in its index CTE — the
    * predicate is the ONLY diff from s10Sql, the one-variable gate
    * pattern (s20's mask-literal relationship, replayed on the
    * metadata dimension). */
  val s22FilteredRetrieve: Q = (s, dir) =>
    retrieveTopK(s10QueryFrame(s, dir),
      retrievalIndex(s, dir)
        .filter(col("quality_score") >= s22QualityFloor),
      planes, s10K)

  /** Quality-band count of the s25 banded store layout (fixed-width
    * over [0,1], the prof3/u13 deterministic-edges argument) and the
    * band the s22 floor lands in. Monotonicity makes band pruning
    * SAFE: for any double x ≥ double(0.6), x·10 ≥ double(0.6)·10 = 6.0
    * (IEEE multiplication is monotone), so every row passing the s22
    * predicate lives in a band ≥ [[s25FloorBand]] partition; the exact
    * predicate is re-applied as a residual filter on the pruned scan
    * (a band-6 row just BELOW the floor — possible when x·10 rounds up
    * across the boundary — is pruned there), so the result is
    * bit-identical to s22's unpartitioned filter. */
  private[operators] val s25Bands = 10
  // capped at the top band like withQband's least(): a floor retune to
  // 1.0 must prune to band 9 (which holds qs ∈ [0.9, 1.0]), not to an
  // empty band range
  private[operators] val s25FloorBand =
    math.min(math.floor(s22QualityFloor * s25Bands).toInt, s25Bands - 1)

  private[operators] def withQband(df: DataFrame): DataFrame =
    df.withColumn("qband",
      least(floor(col("quality_score") * s25Bands), lit(s25Bands - 1))
        .cast("int"))

  /** S25: BANDED STORE LAYOUT (round-13 verdict item 6) — s22's
    * metadata filter pushed into the s21 on-disk store layout: a
    * deployment with a STABLE filter taxonomy partitions the store by
    * (bkt, quality_band) so filtered serving PARTITION-PRUNES the
    * excluded bands instead of map-filtering every row of the probed
    * buckets — at 100 TB with τ=0.6 that is ~20% of bytes never
    * listed, opened, or scanned (the exact trade s22's scaladoc
    * names). The gated query writes the full index under the banded
    * layout (one repartition-routed write, one file per (bkt, band)),
    * then serves the s10 query window with the filter split into the
    * pruning predicate (qband ≥ [[s25FloorBand]]) plus the exact
    * residual (quality_score ≥ τ — see [[s25FloorBand]] for why the
    * pair is lossless). Oracle = [[s22Sql]] VERBATIM: the layout must
    * be invisible to results — only the plan changes (SimilaritySpec
    * pins row-identity with s22 and the pruned scan shape).
    * Scale shape: serving is s10's (corpus side never reshuffles;
    * broadcast probes → BHJ with dynamic bucket pruning), with the
    * band dimension pruned STATICALLY at the scan — both partition
    * columns filter before a byte is read. */
  val s25BandedStore: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s25") { store =>
      writeStore(withQband(retrievalIndex(s, dir)), store,
        Seq("bkt", "qband"))
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
      .filter(col("qband") >= lit(s25FloorBand) &&
        col("quality_score") >= s22QualityFloor)
    retrieveTopK(s10QueryFrame(s, dir), idx, planes, s10K)
  }

  /** S29: RE-BUCKET OF THE BANDED STORE — the two lifecycle dimensions
    * the round-16 gates exercise separately, composed: a deployment
    * running s25's (bkt, qband) layout fires prof8's re-bucket trigger,
    * so the offline rebuild must re-encode the corpus under planes+1
    * AND carry the metadata bands through the swap — the bucket
    * keyspace doubles while the band dimension is untouched, and a
    * pruned reader must see old or new layout atomically on BOTH
    * partition columns (exactly [[graft.sources.Sinks
    * .rewritePartitioned]]'s contract). Serving is s25's shape under
    * the new geometry: static qband pruning + dynamic bucket pruning +
    * the exact residual, through the SAME [[retrieveTopK]] with
    * [[s26Planes]] on both sides. Two variables vs neighbors, each
    * already gated alone: vs s26, the banded layout + filter (s22/s25's
    * dimension); vs s25, the plane count (s26's dimension) — so the
    * oracle is the SAME parameterized generator with both dials set:
    * s10SqlFor(window, masks(radius 1, 7 planes), quality ≥ τ,
    * 7 planes), fully relational, no goldens. Scale shape: one staged
    * re-encode write + one swap per trigger firing (the s26 cost), and
    * serving returns to target occupancy with ~20% of store bytes
    * still never listed at τ=0.6 (the s25 trade) — the composition
    * keeps both properties because the layout carries both partition
    * columns. */
  val s29BandedRebucket: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s29") { store =>
      // stage ∥ base (the s26 overlap, banded layout): geometry and
      // directory keyspace change together, bands carry over — one
      // staged rewrite concurrent with the committed-geometry store
      // write, one atomic swap after both complete
      val (staged, _) = graft.core.Jobs.concurrently {
        graft.sources.Sinks.stageRewrite(s, store,
          withQband(rebucketIndex(s, dir)), Seq("bkt", "qband"))
      } {
        // the banded store a deployment serves under the committed
        // geometry (what its pruned readers hold when the trigger fires)
        writeStore(withQband(retrievalIndex(s, dir)), store,
          Seq("bkt", "qband"))
      }
      graft.sources.Sinks.commitStagedRewrite(s, store, staged)
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
      .filter(col("qband") >= lit(s25FloorBand) &&
        col("quality_score") >= s22QualityFloor)
    retrieveTopK(s10QueryFrame(s, dir), idx, s26Planes, s10K)
  }

  /** S30: PUBLISHED-VERSION DIFF — the audit that closes the versioned
    * store lineage: every lifecycle gate now publishes snapshots with
    * {current, previous} retention, and this operator READS that
    * window — per document, the chunk-count delta between the two
    * published versions, labeled added/removed. This is the "what
    * changed between yesterday's index and today's" report a serving
    * team publishes with every swap (and the tripwire when a fold
    * silently drops or duplicates a slice: the diff must equal the
    * arrival minus the tombstones, nothing else). The replayed
    * lineage: previous = the index before the d11 arrival slice
    * landed; current = the full index after the fold AND the s24
    * tombstone maintenance — so the diff carries BOTH directions
    * (arrivals 'added', tombstoned docs 'removed', and a doc in both
    * sets appears only under its net effect). The two logical versions
    * are MATERIALIZED under ONE published snapshot (prev/ + curr/
    * subtrees): holding two real published versions would consume the
    * entire {current, previous} vacuum window in a single invocation,
    * so one later rebuild would retire the prev side under a live lazy
    * reader (round-17 review finding) — staged under one version, the
    * diff's own readers keep the standard survive-one-rebuild
    * retention contract every other gate's frames enjoy. Oracle:
    * per-doc chunk counts of the SERVED index chain (the cidx CTE —
    * post cn>0, see [[s30Sql]]'s pinned-contract note) with the two
    * modular predicates — the diff is fully relational, the store is
    * the physical path.
    * Scale shape: each side is one doc-keyed count over its snapshot
    * (partial-aggregated map-side), then a full-outer join of two
    * doc-level count frames — O(docs), not O(chunks), and orders of
    * magnitude under the corpus; on a batch-partitioned lineage
    * (d17's) the added side is readable from the delta partitions
    * alone — this operator is the GENERAL differ for post-fold
    * snapshots where the batch dimension has been compacted away. */
  val s30VersionDiff: Q = (s, dir) => {
    val idx = retrievalIndex(s, dir)
    val arriving = pmod(col("doc_id"), lit(Dedup.d11Mod)) ===
      lit(Dedup.d11Res)
    val tombstoned = pmod(col("doc_id"), lit(s24DelMod)) === lit(s24DelRes)
    val store = buildStoreVersion(s, dir, "s30") { st =>
      // independent subtrees of one snapshot — concurrent per guide §2.6
      graft.core.Jobs.concurrently {
        writeStore(idx.filter(!arriving), s"$st/prev", Seq("bkt"))
      } {
        writeStore(idx.filter(!tombstoned), s"$st/curr", Seq("bkt"))
      }
    }._1
    val np = s.read.parquet(s"$store/prev")
      .groupBy("doc_id").agg(count(lit(1)).as("n_prev"))
    val nc = s.read.parquet(s"$store/curr")
      .groupBy("doc_id").agg(count(lit(1)).as("n_curr"))
    np.join(nc, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"))
      .filter(col("n_prev") =!= col("n_curr"))
      .withColumn("change",
        when(col("n_prev") === 0, "added").otherwise("removed"))
      .orderBy("doc_id")
  }

  /** S20: MULTI-PROBE LSH SERVING — the recall dial on [[s10Retrieve]]
    * (the s14-on-s13 relationship, replayed on the LSH index): the
    * SAME query window, index artifact, and rerank, with the probe set
    * widened from hamming-1 to hamming-2 ([[probeMasks]] radius 2 — 22
    * buckets at the committed 6-plane geometry vs s10's 7). The two
    * gates isolate exactly one variable — the probe radius — so their
    * diff IS the dial's recall/cost trade: candidate volume grows by
    * the probed-bucket ratio (≈(1+p+p(p-1)/2)/(1+p), ~3.1× at p=6)
    * while the per-rank cosine list dominates s10's elementwise (a
    * superset candidate pool can only improve the exact-reranked
    * top-k — SimilaritySpec pins both properties, plus measured recall
    * vs the exact twin for the two radii).
    *
    * Scale shape: identical to s10 — the corpus side never reshuffles
    * (broadcast of batch×22 probe rows into the persisted bucket-keyed
    * artifact); per-query cost stays corpus-size-invariant under
    * [[planesFor]] occupancy, just with the 3.1× constant. Production
    * picks the radius per query class (head queries radius 2, tail
    * radius 1) — the dial is a literal, not a rebuild: BOTH radii
    * serve the SAME artifact. */
  val s20MultiprobeLsh: Q = (s, dir) =>
    retrieveTopK(s10QueryFrame(s, dir), retrievalIndex(s, dir),
      planes, s10K, radius = 2)

  /** Base-corpus slice of the s15 index-refresh gate (doc domain;
    * d11's modular-slice rationale — a modular cut puts semantically
    * real chunks in the arriving batch, unlike an id range). */
  private[operators] val s15Mod = 5L
  private[operators] val s15Res = 2L

  /** Retrieval index over the BASE doc slice only — the artifact a
    * serving deployment holds BEFORE the batch lands; persisted per
    * (session, dir) with the [[retrievalIndex]] lifecycle. */
  private[operators] val baseIdxReg =
    new graft.core.Registry[DataFrame](_.unpersist(false))

  private[operators] def baseRetrievalIndex(s: SparkSession,
                                            dir: String): DataFrame =
    baseIdxReg.getOrCompute(s, dir) {
      val df = encodeChunks(
        TextAnalysis.queries("c3_chunk_corpus")(s, dir)
          .filter(pmod(col("doc_id"), lit(s15Mod)) =!= lit(s15Res)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** The ARRIVING BATCH's chunks through the encode, LAZY by measured
    * choice: the chain from the documents scan through c3's curation ∩
    * chunking to [[encodeChunks]] is narrow in doc_id, so every
    * consumer's doc_id restriction PUSHES DOWN to the parquet scan —
    * s21's three sub-batch appends each run a 1/15-of-corpus pipeline,
    * summing to ONE batch encode of work. A persisted variant (the
    * [[batchPostings]] registry pattern) was tried and MEASURED SLOWER
    * end-to-end (s21 sf1 steady 11.2 s lazy vs 16-20 s persisted;
    * sf0.1 6.4 s vs 6.9-7.3 s): materialize + cache-read-back of the
    * wide (chunk_text, ce[64]) rows costs more than the pushed-down
    * recompute, and the cache competes with the serving artifacts for
    * storage memory. Don't "fix" this back without re-measuring both
    * scales. */
  private[operators] def encodedBatch(s: SparkSession, dir: String): DataFrame =
    encodeChunks(
      TextAnalysis.queries("c3_chunk_corpus")(s, dir)
        .filter(pmod(col("doc_id"), lit(s15Mod)) === lit(s15Res)))

  /** The refreshed index: fold the arriving batch's chunks into the
    * persisted base index. LSH buckets don't drift with the corpus the
    * way centroids do (the plane geometry is literal, the embedding is
    * corpus-independent), so — unlike the s11 centroid fold — refresh
    * is a PURE per-row encode + append: no base row is touched, no
    * statistic recomputed, and the result is row-identical to a full
    * rebuild (SimilaritySpec asserts set equality). Production appends
    * the encoded batch to the bucket-partitioned artifact; the
    * re-bucketing trigger is planesFor(n_chunks) crossing a power of
    * two — the cadence contract in BASELINE.md pairs this with s11's. */
  private[graft] def refreshedIndex(s: SparkSession, dir: String): DataFrame =
    baseRetrievalIndex(s, dir).unionByName(encodedBatch(s, dir))

  /** Query frame of the s15 gate: the NEXT [[s10QueryDocs]] corpus-
    * prefix queries (doc_id in [8, 16)) — disjoint from s10's so the
    * two gated entries exercise different probes; same [[queryFrame]]
    * recipe. */
  private[graft] def s15QueryFrame(s: SparkSession, dir: String): DataFrame =
    queryFrame(s, dir,
      col("doc_id") >= s10QueryDocs && col("doc_id") < 2 * s10QueryDocs)

  /** S15: INCREMENTAL RETRIEVAL-INDEX REFRESH (round-12 verdict item
    * 4) — the operational leg s10 names: accept a batch of new
    * documents, fold their chunks into the persisted bucket-keyed
    * index WITHOUT a rebuild, and serve from the refreshed index. The
    * gated query serves the [8,16) query set through
    * [[refreshedIndex]]; its oracle is the full-corpus serving SQL
    * (the refreshed index ≡ full rebuild — the equality the spec pins
    * row-for-row), so the gate verifies the fold-in path end-to-end.
    * Scale shape: the fold costs O(batch) encode (map-only) + the
    * union read; the base artifact never reshuffles. */
  val s15IndexRefresh: Q = (s, dir) =>
    retrieveTopK(s15QueryFrame(s, dir), refreshedIndex(s, dir),
      planes, s10K)

}
