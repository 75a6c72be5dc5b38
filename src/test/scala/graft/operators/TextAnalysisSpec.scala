package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics pins for the text-analysis battery where the oracle can't
  * exercise them (the synthetic corpus contains no PII): t6's redaction
  * patterns on PLANTED matches, both engines' regex subset. */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("t6 redaction masks planted emails and URLs, counts them") {
    val df = Seq(
      ("mail me at jo.doe+x@example.co.uk thanks", 1, 0),
      ("see https://example.com/a?b=1 and http://x.io", 0, 2),
      ("no pii here", 0, 0),
      ("a@b.io then https://c.d/e", 1, 1),
    ).toDF("text", "want_emails", "want_urls")
    val out = df.select(
      regexp_count(col("text"), lit(TextAnalysis.emailPat)).as("n_emails"),
      regexp_count(col("text"), lit(TextAnalysis.urlPat)).as("n_urls"),
      regexp_replace(regexp_replace(col("text"), TextAnalysis.emailPat,
        "<EMAIL>"), TextAnalysis.urlPat, "<URL>").as("red"),
      col("want_emails"), col("want_urls"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n_emails") === r.getAs[Int]("want_emails"), r)
      assert(r.getAs[Int]("n_urls") === r.getAs[Int]("want_urls"), r)
      val red = r.getAs[String]("red")
      assert(!red.contains("@") || red.contains("<EMAIL>"), red)
      assert(!red.contains("http"), red)
    }
  }

  test("t9 BPE training: hand-computed merges on a planted corpus, " +
    "early stop when fully merged") {
    // corpus = three occurrences of "aaab": symbols "a a a b".
    //  iter 1: pairs {a a: 6, a b: 3}            -> merge "a a" (6)
    //          "a a a b" -> "aa a b" (left-to-right non-overlap)
    //  iter 2: pairs {aa a: 3, a b: 3} tie       -> "a b" wins (lex)
    //          "aa a b" -> "aa ab"
    //  iter 3: pairs {aa ab: 3}                  -> merge "aa ab" (3)
    //  iter 4: no pairs left -> STOP (3 of bpeMerges=20 merges emitted)
    val dir = tmpDir("bpe-planted")
    Seq((0L, "aaab aaab", "en", "srcX", 9), (1L, "aaab", "en", "srcX", 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t9BpeTrain(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "a a", 6L), (2, "a b", 3L),
      (3, "aa ab", 3L)))
  }

  test("t9 BPE merges are symbol-boundary-exact: pair 's t' must not " +
    "fire inside the symbol sequence [es, t]") {
    // words: est x2, st x3, es x4.
    //  iter 1: pairs {e s: 6, s t: 5}  -> merge "e s" (6)
    //          est -> [es, t]; es -> [es]
    //  iter 2: pairs {es t: 2, s t: 3} -> merge "s t" (3)
    //          must rewrite ONLY st -> [st]; a naive single-space
    //          substring replace also corrupts [es, t] -> [est]
    //  iter 3: pairs {es t: 2}         -> merge "es t" (2)
    //  iter 4: no pairs left -> STOP
    val dir = tmpDir("bpe-boundary")
    Seq((0L, "est est st st st es es es es", "en", "srcX", 29))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t9BpeTrain(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "e s", 6L), (2, "s t", 3L),
      (3, "es t", 2L)))
  }

  test("t10 BPE encode: fully-merged planted corpus encodes one token " +
    "per word; counts are word-count-weighted") {
    // same corpus as the t9 planted test: training exhausts at 3 merges
    // and every "aaab" collapses to a single symbol
    val dir = tmpDir("bpe-encode")
    Seq((0L, "aaab aaab", "en", "srcX", 9), (1L, "aaab", "en", "srcX", 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t10BpeEncode(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 2L, 2L), (1L, 1L, 1L)))
  }

  test("t10 BPE encode invariants on the synthetic corpus: every word " +
    "is ≥1 token, encoding never exceeds character count") {
    val dir = "/root/testdata/sf0.001"
    val enc = TextAnalysis.t10BpeEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (nw, nb) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))
      assert(nb >= nw, s"doc ${r.get(0)}: $nb bpe tokens < $nw words")
    }
    // 20 merges on a natural-ish corpus must actually compress: strictly
    // fewer BPE tokens than characters for the corpus as a whole
    val chars = graft.core.Tables.t(spark, dir, "documents")
      .agg(sum(length(regexp_replace(lower(col("text")), "\\s+", ""))))
      .collect()(0).getLong(0)
    val bpe = enc.map(_.getAs[Long]("n_bpe_tokens")).sum
    info(s"corpus: $chars chars -> $bpe bpe tokens")
    assert(bpe < chars)
  }

  test("t11 native bigram machinery: PairCountsBuf (incl. growth and " +
    "merge) and BigramModel.score agree with naive recounting") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc defé"
    def randDoc(): String =
      (0 until (rnd.nextInt(40) + 2))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0 until 500).map(_ => randDoc())
    // naive model: pair counts + prefix totals over the whole corpus
    val naive = docs.flatMap(s => s.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    // buffer path, split across 7 partial buffers then merged — forces
    // both the open-address growth and the mergeFrom path
    val bufs = Array.fill(7)(new graft.plans.PairCountsBuf)
    docs.zipWithIndex.foreach { case (s, i) => bufs(i % 7).addPairsOf(s) }
    val merged = bufs.reduce { (a, b) => a.mergeFrom(b); a }
    var got = Map.empty[String, Long]
    merged.foreachEntry { (code, cnt) =>
      got += s"${(code >>> 16).toChar}${(code & 0xFFFF).toChar}" -> cnt
    }
    assert(got === naive)
    // model scoring = Σ ln(c_pair / c_prefix) recomputed naively
    val counts = got.toSeq.map { case (p, c) =>
      ((p.charAt(0).toInt << 16) | p.charAt(1).toInt, c)
    }
    val model = graft.plans.BigramModel.build(counts)
    val pre = naive.groupBy(_._1.charAt(0)).map {
      case (c, m) => c -> m.values.sum
    }
    docs.take(50).foreach { s =>
      val expect = s.sliding(2).filter(_.length == 2)
        .map(p => math.log(naive(p).toDouble / pre(p.charAt(0)).toDouble))
        .sum
      assert(math.abs(model.score(s) - expect) < 1e-9, s"doc=$s")
    }
  }

  test("t11 bigram LM: hand-computed log-probs on a planted corpus; " +
    "scores are never positive") {
    val dir = tmpDir("bigram-lm")
    // corpus chars: doc0 "aa", doc1 "ab" -> bigrams aa(1), ab(1);
    // prefix 'a' total 2 -> lp(aa) = lp(ab) = ln(1/2)
    Seq((0L, "aa", "en", "srcX", 2), (1L, "ab", "en", "srcX", 2))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t11BigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val half = math.log(0.5)
    assert(got.map(_._1) === Seq(0L, 1L))
    assert(got.map(_._2) === Seq(1L, 1L))
    got.foreach { case (_, _, avg) => assert(math.abs(avg - half) < 1e-12) }
    // corpus-scale: every score ≤ 0 (P ≤ 1 always), bigram counts = len-1
    val full = TextAnalysis.t11BigramLm(spark, "/root/testdata/sf0.001")
      .collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.isNullAt(2) || r.getAs[Double]("sum_logprob") <= 0.0)
    }
  }

  test("u10 temperature sampling: keep rate strictly decreases with " +
    "stratum size (α < 1 flattens); every rate in (0, 1]") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.u10TemperatureSample(spark, dir)
    val rates = kept.select("source", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rates.values.foreach(v => assert(v > 0.0 && v <= 1.0, rates))
    // temperature rule: bigger stratum -> smaller (or capped) keep rate
    val bySize = rates.toSeq.sortBy { case (s, _) => sizes(s) }
    bySize.sliding(2).foreach {
      case Seq((s1, r1), (s2, r2)) if sizes(s1) < sizes(s2) =>
        assert(r1 >= r2, s"rate($s1)=$r1 < rate($s2)=$r2 but " +
          s"${sizes(s1)} < ${sizes(s2)} docs")
      case _ =>
    }
    // the sampler actually samples: strictly between 0 and everything
    val total = docs.count()
    val n = kept.count()
    assert(n > 0 && n < total)
  }

  test("u12 token mix: emitted tokens track the per-source budget " +
    "share; repetition is exact full epochs + hash-gated fraction") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val out = TextAnalysis.u12TokenMix(spark, dir)
    // doc multiplicities are contiguous epochs 0..k (full epochs all
    // present, at most one fractional on top)
    val mult = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("epoch").as("maxe")).collect()
    mult.foreach(r =>
      assert(r.getAs[Long]("n") === r.getAs[Int]("maxe") + 1L, r))
    // within a source, per-doc multiplicity differs by at most 1
    // (floor(epochs) vs floor(epochs)+1) — the deterministic-epoch rule
    val spread = out.groupBy("source", "doc_id").count()
      .groupBy("source").agg((max("count") - min("count")).as("d"))
      .collect()
    spread.foreach(r => assert(r.getAs[Long]("d") <= 1L, r))
    // emitted token mass per source approaches weight_s * budget
    // (exact up to the per-doc granularity of the fractional epoch);
    // inventory comes from the CORPUS, not the output — fractional-epoch
    // sources drop docs from the output entirely
    val tokDocs = docs.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val inv = tokDocs.groupBy("source")
      .agg(sum("n_tokens").as("inv")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("inv")).toMap
    val totalInv = inv.values.sum.toDouble
    val emitted = out.groupBy("source").agg(sum("n_tokens").as("got"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("got")).toMap
    val wRaw = inv.keys.map(s => s ->
      TextAnalysis.mixWeights.toMap.getOrElse(s,
        TextAnalysis.mixWeightDefault)).toMap
    val wSum = wRaw.values.sum
    emitted.foreach { case (s, got) =>
      val target = wRaw(s) / wSum * TextAnalysis.mixBudgetFrac * totalInv
      val capped = math.min(target, TextAnalysis.mixMaxEpochs * inv(s))
      // loose band: the fractional epoch is hash-gated per doc, so small
      // strata carry binomial noise; the EXACT multiset is the oracle's
      // job — this asserts the budget shape, not bit equality
      assert(math.abs(got - capped) / capped < 0.5,
        s"$s emitted $got vs target $capped")
    }
    // the repetition path is LIVE: at least one doc emitted more than once
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() > 0,
      "no doc repeated — multi-epoch path not exercised")
  }

  test("t13 tf-idf: hand-computed scores on a planted corpus; top-k, " +
    "ranking, and tiebreak order") {
    // 4 docs; "common" appears in all 4 (idf = ln(1) = 0 → never a top
    // term when any rarer token exists), "rare" in 1 (idf = ln 4).
    val docs = Seq(
      (0L, "rare common common"),
      (1L, "common mid"),
      (2L, "common mid"),
      (3L, "common"),
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("t13_planted")
    val tok = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("token").agg(countDistinct("doc_id").as("df"))
    val scored = tf.join(df, "token")
      .withColumn("tfidf", round(col("tf") * log(lit(4.0) / col("df")), 6))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"))
        -> r.getAs[Double]("tfidf")).toMap
    val ln = math.log _
    assert(scored((0L, "rare")) === BigDecimal(1 * ln(4.0 / 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(scored((0L, "common")) === 0.0) // df = N → idf 0, even at tf 2
    assert(scored((1L, "mid")) === BigDecimal(1 * ln(4.0 / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // full operator on the synthetic corpus: exactly topK rows per doc
    // (corpus docs all have >= topK distinct tokens), rk dense from 1,
    // scores non-increasing in rk, ties broken by token ascending
    val out = TextAnalysis.t13Tfidf(spark, "/root/testdata/sf0.001")
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to sorted.length))
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("tfidf"), b.getAs[Double]("tfidf"))
          assert(sa > sb || (sa == sb &&
            a.getAs[String]("token") < b.getAs[String]("token")))
        case _ => ()
      }
    }
  }

  test("u9 stratified sample: rate-1.0 strata keep every row; kept " +
    "fraction tracks the mixture rate") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.t(spark, dir, "documents")
    val kept = TextAnalysis.u9StratifiedSample(spark, dir)
    val total0 = docs.filter(col("source") === "src0").count()
    val kept0 = kept.filter(col("source") === "src0").count()
    assert(kept0 === total0) // src0 rate = 1.0: nothing may drop
    // every kept row satisfies its own threshold
    assert(kept.filter(col("u_mix") >= col("keep_rate")).count() === 0)
    // downweighted stratum keeps strictly less than everything
    val total1 = docs.filter(col("source") === "src1").count()
    val kept1 = kept.filter(col("source") === "src1").count()
    assert(kept1 < total1 && kept1 > 0)
  }

  test("t8 sequence pack: two-level scan equals the naive global window; " +
    "offsets contiguous") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.t8SequencePack(spark, dir).collect()
    // naive form: ONE unpartitioned window over the whole corpus — the
    // single-task anti-pattern the operator avoids, used here as ground
    // truth only
    val tok = graft.core.Tables.t(spark, dir, "documents").select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val naive = tok.withColumn("global_start",
      coalesce(sum("n_tokens").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").collect()
    assert(got.length === naive.length)
    got.zip(naive).foreach { case (g, n) =>
      assert(g.getAs[Long]("doc_id") === n.getAs[Long]("doc_id"))
      assert(g.getAs[Long]("global_start") === n.getAs[Long]("global_start"),
        s"doc ${g.getAs[Long]("doc_id")}")
    }
    // packing invariants: contiguous offsets, blocks consistent
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("global_start") + a.getAs[Long]("n_tokens")
          === b.getAs[Long]("global_start"))
      case _ =>
    }
    got.foreach { r =>
      val fb = r.getAs[Long]("first_block")
      val lb = r.getAs[Long]("last_block")
      assert(lb >= fb)
      assert(r.getAs[Boolean]("straddles") === (fb != lb))
    }
    assert(got.exists(_.getAs[Boolean]("straddles")),
      "no doc straddles a block boundary — fixture too small?")
  }

  test("u11 shuffle: positions are a permutation of 0..n-1, shards " +
    "balanced within 1, and the two-level scan equals the naive window") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.u11ShuffleShard(spark, dir).collect()
    val n = got.length
    assert(got.map(_.getAs[Long]("shuffle_pos")).sorted.toSeq
      === (0L until n).toSeq) // bijection
    val byShard = got.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(byShard.max - byShard.min <= 1, s"shards $byShard")
    // ground truth: ONE unpartitioned window (the anti-pattern, used
    // as reference only)
    val naive = graft.core.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.Portable.h60(
        concat_ws("|", col("doc_id"), lit("shuf42"))).as("hk"))
      .withColumn("pos",
        row_number().over(Window.orderBy("hk", "doc_id")).cast("long") - 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
      .toMap
    got.foreach { r =>
      assert(r.getAs[Long]("shuffle_pos") === naive(r.getAs[Long]("doc_id")))
    }
  }

  test("c2 full curation is a subset of c1 with the extra gates applied") {
    val dir = "/root/testdata/sf0.001"
    val c1Ids = TextAnalysis.c1Curation(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c2 = TextAnalysis.c2CurationFull(spark, dir).collect()
    assert(c2.nonEmpty && c2.length < c1Ids.size)
    c2.foreach { r =>
      assert(c1Ids.contains(r.getAs[Long]("doc_id")))
      assert(r.getAs[Double]("hot_ratio") <= 0.5)
    }
  }

  test("u15 cluster split: near-dup cluster members never straddle " +
    "splits; corpus covered exactly once; all splits populated") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.u15ClusterSplit(spark, dir).collect()
    // exactly-once coverage
    assert(out.length.toLong ===
      graft.core.Tables.t(spark, dir, "documents").count())
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
    // THE leakage guard: every d7 cluster lands whole in one split
    val splitOf = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clusters = Dedup.queries("d7_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_rep").collect()
      .groupBy(_.getAs[Long]("cluster_rep"))
    assert(clusters.nonEmpty, "testdata must contain near-dup clusters")
    clusters.foreach { case (rep, members) =>
      val splits = members.map(m => splitOf(m.getAs[Long]("doc_id"))).toSet
      assert(splits.size === 1,
        s"cluster $rep straddles splits: $splits")
    }
    // 8/1/1 rule: all populated, train dominant
    val byName = out.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(byName.keySet === Set("train", "val", "test"))
    assert(byName("train") > byName("val") + byName("test"))
  }

  test("c5 funnel: conserves the corpus, kept bucket ≡ c2 survivors, " +
    "first-match ordering") {
    val dir = "/root/testdata/sf0.001"
    val funnel = TextAnalysis.c5CurationFunnel(spark, dir).collect()
    // conservation: every input document lands in exactly one bucket
    val total = funnel.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.core.Tables.t(spark, dir, "documents").count()
    assert(total === corpus)
    // the terminal bucket is exactly the c2 survivor set
    val kept = funnel.filter(_.getAs[String]("stage") == "kept")
      .map(_.getAs[Long]("n_docs")).sum
    assert(kept === TextAnalysis.c2CurationFull(spark, dir).count())
    // first-match ordering: stage names ride their pipeline ordinals
    funnel.foreach { r =>
      assert(TextAnalysis.c5Stages(r.getAs[Int]("stage_ord") - 1)
        === r.getAs[String]("stage"))
    }
    // the funnel actually splits (at least dup/kept buckets exist)
    assert(funnel.map(_.getAs[String]("stage")).toSet.size >= 2)
  }

  test("t12 chunking: coverage, stride, overlap, and reconstruction " +
    "invariants on the real corpus; oracle cap pinned") {
    val dir = "/root/testdata/sf0.001"
    val C = TextAnalysis.chunkTokens
    val S = TextAnalysis.chunkStride
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tk"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1)).toMap
    val chunks = TextAnalysis.t12Chunk(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === toks.keySet) // every doc chunked
    checkChunkInvariants(chunks, toks)
    // the oracle's static range(0,16) cap holds against the data
    chunks.values.foreach(rows => assert(rows.length <= 16))
  }

  /** t12 invariants shared by the corpus and the boundary-geometry
    * tests: contiguous indexes, stride starts, window exactness, full
    * coverage, full non-last chunks, and stride-prefix reconstruction
    * of the exact token sequence (no token lost, none duplicated
    * beyond the overlap — the property a retrieval index depends on). */
  private def checkChunkInvariants(
      chunks: Map[Long, Array[org.apache.spark.sql.Row]],
      toks: Map[Long, Seq[String]]): Unit = {
    val C = TextAnalysis.chunkTokens
    val S = TextAnalysis.chunkStride
    chunks.foreach { case (id, rows) =>
      val n = toks(id).length
      val sorted = rows.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq ===
        sorted.indices.toSeq, s"doc $id")
      assert(sorted.forall(_.getAs[Int]("n_chunks") === sorted.length))
      sorted.foreach { r =>
        val start = r.getAs[Int]("start_tok")
        val len = r.getAs[Int]("n_chunk_tokens")
        assert(start === r.getAs[Int]("chunk_idx") * S)
        assert(len === math.min(C, n - start)) // never past the end
        assert(r.getAs[String]("chunk_text") ===
          toks(id).slice(start, start + len).mkString(" "))
      }
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") +
        last.getAs[Int]("n_chunk_tokens") === n)
      sorted.init.foreach(r =>
        assert(r.getAs[Int]("n_chunk_tokens") === C))
      val rebuilt = sorted.init.flatMap(
        _.getAs[String]("chunk_text").split(" ").take(S)) ++
        sorted.last.getAs[String]("chunk_text").split(" ")
      assert(rebuilt.toSeq === toks(id).toSeq, s"doc $id")
    }
  }

  test("t12 chunking: boundary geometries the corpus misses — n at/" +
    "around the window, stride multiples, and the oracle cap") {
    val C = TextAnalysis.chunkTokens   // 32
    val S = TextAnalysis.chunkStride   // 24
    // boundary token counts: single-token doc; one around each chunk-
    // count step (n <= C -> 1 chunk; then a new chunk every S tokens);
    // the 392-token oracle-cap edge; plus seeded random fill
    val rng = new scala.util.Random(42)
    val boundary = Seq(1, S - 1, S, S + 1, C - 1, C, C + 1,
      C + S - 1, C + S, C + S + 1, 2 * C, 5 * S, 15 * S + C)
    val ns = boundary ++ Seq.fill(40)(1 + rng.nextInt(15 * S + C))
    val docs = ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val dir = tmpDir("t12-boundary")
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val toks = docs.map { case (id, text) =>
      id -> (text.split(" "): Seq[String]) }.toMap
    val chunks = TextAnalysis.t12Chunk(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === toks.keySet)
    checkChunkInvariants(chunks, toks)
    // chunk-count formula at the exact steps
    def expected(n: Int): Int = if (n <= C) 1 else (n - C + S - 1) / S + 1
    chunks.foreach { case (id, rows) =>
      assert(rows.length === expected(toks(id).length), s"doc $id")
    }
    // the 392-token doc sits exactly at the oracle's range(0,16) cap
    assert(chunks(ns.indexOf(15 * S + C).toLong).length === 16)
  }

  test("c6 funnel drift: PSI recomputed in plain Scala from the shared " +
    "dispositions; side split conserves the corpus per source") {
    val dir = "/root/testdata/sf0.001"
    val eps = graft.queries.Profile.driftEps
    val disp = TextAnalysis.c5Dispositions(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("stage_ord")))
    val out = TextAnalysis.queries("c6_funnel_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Int]("n_buckets"), r.getAs[Long]("n_ref"),
          r.getAs[Long]("n_cur"), r.getAs[Double]("psi"))).toMap
    val bySource = disp.groupBy(_._2)
    assert(out.keySet === bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val (nb, nRef, nCur, psi) = out(src)
      val isCur = (d: Long) => d % Dedup.d11Mod == Dedup.d11Res
      val ref = rows.filterNot(r => isCur(r._1))
      val cur = rows.filter(r => isCur(r._1))
      // conservation: the modular cut partitions each source's docs
      assert(nRef === ref.length && nCur === cur.length)
      assert(nRef + nCur === rows.length)
      // plain-Scala PSI over the observed (stage) buckets, same eps
      // floor — the formula independent of Spark/DuckDB expression
      // plumbing
      val buckets = rows.map(_._3).distinct.sorted
      assert(nb === buckets.length)
      val expected = buckets.map { st =>
        // same zero-total rule as engine/oracle: empty side ⇒ eps floor
        val p = math.max(if (ref.isEmpty) 0.0
          else ref.count(_._3 == st).toDouble / ref.length, eps)
        val q = math.max(if (cur.isEmpty) 0.0
          else cur.count(_._3 == st).toDouble / cur.length, eps)
        (q - p) * math.log(q / p)
      }.sum
      assert(math.abs(psi - expected) < 1e-6,
        s"$src: engine psi $psi vs plain-Scala $expected")
    }
  }

  test("t5 repetition ratio: duplicated shingles raise the ratio") {
    // the planted exact-duplicate docs in the corpus must have the same
    // rep_ratio as their originals (same text → same shingle multiset)
    val rep = TextAnalysis.t5Repetition(spark, "/root/testdata/sf0.001")
    val byId = rep.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(byId.nonEmpty)
    assert(byId.values.forall(v => v >= 0.0 && v < 1.0))
  }
}
