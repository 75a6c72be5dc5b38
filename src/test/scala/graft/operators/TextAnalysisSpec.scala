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
