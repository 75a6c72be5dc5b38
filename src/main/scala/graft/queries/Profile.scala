package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Agg

/** Data-quality PROFILING — the hygiene scans a 100 TB corpus pipeline
  * runs continuously before/after every ingest (the reference's closest
  * analog is its ad-hoc `printSchema`/count checks around
  * scripts/02_bronze.py:84-104; this family is the productionized form).
  *
  * Scale shape, deliberately LONG-FORM: each profiled column is melted to
  * `(column_name, value)` rows with a map-only explode, then ONE
  * aggregation keyed by column name computes every statistic. The
  * alternatives both fail at scale: k separate passes re-scan the table
  * k times, and a single WIDE row with k `COUNT(DISTINCT …)`s plans as
  * Catalyst's Expand (same k× row multiplication as the melt) but funnels
  * the final merge through ONE group — the long form keeps the k× work
  * map-side and the distinct machinery partitioned by (column, value).
  */
object Profile {

  type Q = (SparkSession, String) => DataFrame

  /** PROF1: per-column completeness + cardinality over `orders`, plus a
    * derived view column (`NULLIF(o_orderstatus,'F')`) so the null path
    * is genuinely exercised on the null-free synthetic tables — profiling
    * derived/view columns is the real operational shape (a feed's
    * "effective" columns, not just its physical ones). */
  val prof1Completeness: Q = (s, dir) => {
    val src = t(s, dir, "orders")
    val profiled: Seq[(String, Column)] = Seq(
      "o_orderstatus" -> col("o_orderstatus").cast("string"),
      "o_orderpriority" -> col("o_orderpriority").cast("string"),
      "o_custkey" -> col("o_custkey").cast("string"),
      "o_orderstatus_nonf" -> nullif(col("o_orderstatus"), lit("F")))
    src.select(explode(array(profiled.map { case (n, c) =>
        struct(lit(n).as("column_name"), c.as("v")) }: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("kv.v").as("v"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"))
      .orderBy("column_name")
  }

  /** PROF2: numeric column statistics over `lineitem` — min/max/avg/
    * sample-stddev plus EXACT median via the native ExactPercentile
    * aggregate (graft.plans.PercentileExact; t-digest swap for the
    * 100 TB path via spark.graft.approxPercentile, same as a6). */
  val prof2NumericStats: Q = (s, dir) => {
    val src = t(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val melted = src.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("double").as("v"))): _*))
        .as("kv"))
      .select(col("kv.column_name").as("column_name"), col("kv.v").as("v"))
    melted.groupBy("column_name")
      .agg(min("v").as("v_min"), max("v").as("v_max"),
        avg("v").as("v_avg"), stddev_samp(col("v")).as("v_stddev"),
        Agg.median(s, col("v")).as("v_median"))
      .orderBy("column_name")
  }

  /** PROF3: fixed-width histogram of `l_extendedprice` (bin width 100
    * anchored at 900 — ~1k bins on the driver's TPC-H-style price
    * domain), with per-bin count and observed min/max. Pure map-side
    * combine into the bin groups: the distribution scan that costs one
    * pass regardless of data volume. Bin arithmetic is IEEE double
    * `floor((x - 900) / 100)` in BOTH engines, so bin edges cannot
    * diverge between Spark and the oracle. */
  val prof3Histogram: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select(floor((col("l_extendedprice") - 900) / 100).cast("int")
        .as("bin"), col("l_extendedprice"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("l_extendedprice").as("bin_min"),
        max("l_extendedprice").as("bin_max"))
      .withColumn("bin_lo", (lit(900) + col("bin") * 100).cast("double"))
      .select("bin", "bin_lo", "n", "bin_min", "bin_max")
      .orderBy("bin")

  /** PROF4: corpus token-length distribution per source — doc counts,
    * total tokens, and p50/p90/p99 token-length percentiles over the
    * SAME BPE-ish token domain t1/t8/u12 count in (shared pre-tokenizer,
    * operators.TextAnalysis.regexTokenCount). The sequence-length profile
    * that sizes packing (t8) and token budgets (u12) for a training run;
    * exact percentiles by default, t-digest via the a6 flag at 100 TB. */
  val prof4TokenDist: Q = (s, dir) => {
    import graft.operators.TextAnalysis
    // token counts off the persisted annotation silver stage
    // (n_regex_tokens == regexTokenCount(text) by construction) — the
    // profile costs one cached-frame aggregation, not a regex pass
    TextAnalysis.annotations(s, dir)
      .select(col("source"), col("n_regex_tokens").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        Agg.percentile(s, col("n_tokens"), 0.5).as("p50_tokens"),
        Agg.percentile(s, col("n_tokens"), 0.9).as("p90_tokens"),
        Agg.percentile(s, col("n_tokens"), 0.99).as("p99_tokens"))
      .orderBy("source")
  }

  /** PROF5: cross-column correlation profile — Pearson r + sample
    * covariance per column pair, the relationship scan of a profiling
    * suite. `corr`/`covar_samp` are algebraic aggregates (co-moment
    * merge): single pass, map-side combinable, constant-size state —
    * the 100 TB shape needs nothing special. Pairs are chosen
    * well-conditioned (|r| far from 0) so the 6-sig-fig oracle compare
    * is robust to cross-engine summation-order noise; a near-zero r
    * would demand ~1e-9 ABSOLUTE agreement, which float merge order
    * cannot guarantee. */
  val prof5Correlations: Q = (s, dir) => {
    val src = t(s, dir, "lineitem")
    val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val pairs: Seq[(String, Column, Column)] = Seq(
      ("disc_vs_keep", col("l_discount"), lit(1) - col("l_discount")),
      ("price_vs_net", col("l_extendedprice"), net),
      ("qty_vs_total", col("l_quantity"),
        col("l_quantity") * col("l_extendedprice")))
    val melted = src.select(explode(array(pairs.map { case (n, x, y) =>
        struct(lit(n).as("pair"), x.cast("double").as("x"),
          y.cast("double").as("y")) }: _*)).as("kv"))
      .select(col("kv.pair").as("pair"), col("kv.x").as("x"),
        col("kv.y").as("y"))
    melted.groupBy("pair")
      .agg(corr(col("x"), col("y")).as("pearson_r"),
        covar_samp(col("x"), col("y")).as("covar"),
        count(lit(1)).as("n"))
      .orderBy("pair")
  }

  /** PROF6 reference/current split date and numeric bin width. */
  private[queries] val driftSplit = "1998-01-01"
  private[queries] val driftBinWidth = 25000.0

  /** Probability floor for empty-on-one-side buckets (the standard PSI
    * epsilon — keeps ln() finite without dropping the bucket's drift
    * contribution entirely). */
  private[graft] val driftEps = 1e-6

  /** COMMITTED PSI alert bands (round-18 verdict item 7) — the
    * standard industry interpretation of the population stability
    * index: PSI < 0.1 = stable (no action), 0.1 ≤ PSI < 0.2 = watch
    * (moderate shift — monitor the next builds), PSI ≥ 0.2 = alert
    * (significant shift — investigate BEFORE training on the output).
    * These are the thresholds the c6 funnel-drift tripwire publishes
    * with every build (its `band` column) and the reading rule for
    * prof6's per-feature psi; the contract lives in BASELINE.md
    * §"Funnel-drift alert contract" and the classification of planted
    * drift is pinned by PropertiesSpec. */
  private[graft] val psiWatch = 0.1
  private[graft] val psiAlert = 0.2

  /** Band classification of a (rounded) PSI column — both the engine
    * and the DuckDB oracle classify the SAME round(psi, 6) value, so
    * the band can never flap across engines at a threshold boundary. */
  private[graft] def psiBandCol(
      psi: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(psi < psiWatch, lit("stable"))
      .when(psi < psiAlert, lit("watch"))
      .otherwise(lit("alert"))
  }

  /** PROF6: POPULATION-STABILITY drift profile — PSI (population
    * stability index, Σ (q−p)·ln(q/p) over bucketed distributions)
    * between a reference window (`o_orderdate` < [[driftSplit]]) and
    * the current window, for one binned-numeric feature (o_totalprice,
    * fixed [[driftBinWidth]] bins — deterministic edges, the prof3
    * argument) and one categorical feature (o_orderpriority). The
    * monitoring scan every production feature store runs per ingest to
    * catch upstream distribution shift before it reaches training.
    *
    * Scale shape: ONE table scan melts both features to (feature,
    * bucket, side) rows map-side; one map-side-combined aggregation
    * produces per-(feature,bucket) counts — bounded output (bins are
    * fixed-width over a bounded domain + a low-cardinality categorical,
    * ~25 rows regardless of input volume), so the totals window and the
    * final per-feature PSI reduction run on metadata-scale frames. Both
    * probabilities are floored at [[driftEps]] (same in the oracle) so
    * a bucket present on only one side contributes finitely. */
  val prof6Drift: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val src = t(s, dir, "orders")
    val isRef = col("o_orderdate") < lit(driftSplit).cast("timestamp")
    val melted = src.select(isRef.as("is_ref"), explode(array(
        struct(lit("o_totalprice_b25k").as("feature"),
          concat(lit("b"), floor(col("o_totalprice") / driftBinWidth)
            .cast("int").cast("string")).as("bucket")),
        struct(lit("o_orderpriority").as("feature"),
          col("o_orderpriority").as("bucket")))).as("kv"))
      .select(col("is_ref"), col("kv.feature").as("feature"),
        col("kv.bucket").as("bucket"))
    val bins = melted.groupBy("feature", "bucket").agg(
      count(when(col("is_ref"), 1)).as("n_ref"),
      count(when(!col("is_ref"), 1)).as("n_cur"))
    // totals via a window over the BOUNDED bins frame (~25 rows by
    // construction at any corpus size — never the input table)
    val w = Window.partitionBy("feature")
    bins
      .withColumn("ref_tot", sum("n_ref").over(w))
      .withColumn("cur_tot", sum("n_cur").over(w))
      // explicit zero-total guard (round-18, the c6 rule applied
      // uniformly): a window entirely empty on one side would hit
      // Spark's null-on-divide-by-zero vs DuckDB's IEEE inf — both
      // engines share "empty side ⇒ every bucket at the eps floor"
      .withColumn("p", greatest(
        when(col("ref_tot") > 0,
          col("n_ref").cast("double") / col("ref_tot")).otherwise(0.0),
        lit(driftEps)))
      .withColumn("q", greatest(
        when(col("cur_tot") > 0,
          col("n_cur").cast("double") / col("cur_tot")).otherwise(0.0),
        lit(driftEps)))
      .groupBy("feature")
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        max("ref_tot").as("n_ref"),
        max("cur_tot").as("n_cur"),
        round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6)
          .as("psi"))
      .orderBy("feature")
  }

  val queries: Map[String, Q] = Map(
    "prof1_completeness" -> prof1Completeness,
    "prof2_numeric_stats" -> prof2NumericStats,
    "prof3_histogram" -> prof3Histogram,
    "prof4_token_dist" -> prof4TokenDist,
    "prof5_correlations" -> prof5Correlations,
    "prof6_drift" -> prof6Drift,
  )

  val oracle: Map[String, String] = Map(
    "prof1_completeness" -> {
      def one(name: String, expr: String) =
        s"""SELECT '$name' AS column_name,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT($expr) AS BIGINT) AS n_nonnull,
            CAST(COUNT(DISTINCT $expr) AS BIGINT) AS n_distinct
            FROM orders"""
      Seq(
        one("o_orderstatus", "o_orderstatus"),
        one("o_orderpriority", "o_orderpriority"),
        one("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        one("o_orderstatus_nonf", "NULLIF(o_orderstatus, 'F')"),
      ).mkString("", " UNION ALL ", " ORDER BY column_name")
    },
    "prof2_numeric_stats" -> {
      def one(name: String) =
        s"""SELECT '$name' AS column_name,
            MIN($name) AS v_min, MAX($name) AS v_max,
            AVG($name) AS v_avg, STDDEV_SAMP($name) AS v_stddev,
            MEDIAN($name) AS v_median
            FROM lineitem"""
      Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(one).mkString("", " UNION ALL ", " ORDER BY column_name")
    },
    "prof4_token_dist" -> {
      val pat = graft.operators.TextAnalysis.tokenPattern
      s"""WITH tok AS (
           SELECT source,
             len(regexp_extract_all(text, '$pat')) AS n_tokens
           FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           quantile_cont(n_tokens, 0.5) AS p50_tokens,
           quantile_cont(n_tokens, 0.9) AS p90_tokens,
           quantile_cont(n_tokens, 0.99) AS p99_tokens
         FROM tok GROUP BY source ORDER BY source"""
    },
    "prof5_correlations" -> {
      def one(name: String, x: String, y: String) =
        s"""SELECT '$name' AS pair,
            corr($x, $y) AS pearson_r,
            covar_samp($x, $y) AS covar,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem"""
      Seq(
        one("disc_vs_keep", "l_discount", "(1 - l_discount)"),
        one("price_vs_net", "l_extendedprice",
          "(l_extendedprice * (1 - l_discount))"),
        one("qty_vs_total", "l_quantity", "(l_quantity * l_extendedprice)"),
      ).mkString("", " UNION ALL ", " ORDER BY pair")
    },
    "prof3_histogram" ->
      """SELECT CAST(FLOOR((l_extendedprice - 900) / 100) AS INT) AS bin,
         CAST(900 + CAST(FLOOR((l_extendedprice - 900) / 100) AS INT) * 100
           AS DOUBLE) AS bin_lo,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(l_extendedprice) AS bin_min, MAX(l_extendedprice) AS bin_max
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    // prof6: identical formula and eps floor; DuckDB SUM(BIGINT) widens
    // to HUGEINT, so the window totals are cast back for the Spark
    // long-typed schema.
    "prof6_drift" ->
      s"""WITH m AS (
            SELECT (o_orderdate < TIMESTAMP '$driftSplit') AS is_ref,
              'o_totalprice_b25k' AS feature,
              'b' || CAST(CAST(FLOOR(o_totalprice / $driftBinWidth) AS INT)
                AS VARCHAR) AS bucket
            FROM orders
            UNION ALL
            SELECT (o_orderdate < TIMESTAMP '$driftSplit'),
              'o_orderpriority', o_orderpriority
            FROM orders),
          b AS (
            SELECT feature, bucket,
              CAST(count_if(is_ref) AS BIGINT) AS n_ref,
              CAST(count_if(NOT is_ref) AS BIGINT) AS n_cur
            FROM m GROUP BY 1, 2),
          p AS (
            SELECT feature, n_ref, n_cur,
              CAST(SUM(n_ref) OVER (PARTITION BY feature) AS BIGINT)
                AS ref_tot,
              CAST(SUM(n_cur) OVER (PARTITION BY feature) AS BIGINT)
                AS cur_tot
            FROM b),
          x AS (
            SELECT feature, ref_tot, cur_tot,
              greatest(CASE WHEN ref_tot > 0
                THEN CAST(n_ref AS DOUBLE) / ref_tot ELSE 0 END,
                $driftEps) AS pp,
              greatest(CASE WHEN cur_tot > 0
                THEN CAST(n_cur AS DOUBLE) / cur_tot ELSE 0 END,
                $driftEps) AS qq
            FROM p)
          SELECT feature, CAST(COUNT(*) AS INT) AS n_buckets,
            MAX(ref_tot) AS n_ref, MAX(cur_tot) AS n_cur,
            round(SUM((qq - pp) * ln(qq / pp)), 6) AS psi
          FROM x GROUP BY 1 ORDER BY 1""",
  )
}
