package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed-pinned ~sf1 generator for the scale-headroom run (BASELINE.md
  * §"sf1 scale evidence"): 10× the sf0.1 cardinalities for the four
  * tables the d-battery / fs_single_pass / e8 read. NOT committed as
  * data — regenerate with `runMain graft.tools.GenScale [outDir]`.
  *
  * All randomness is xxhash64(id, streamId) — a pure function of the row
  * id, so the dataset is bit-reproducible regardless of partitioning
  * (unlike rand(seed), which keys on partition layout). Planted
  * structure mirrors the driver testdata's shape: ~1% exact-dup
  * documents (doc_id % 100 == 1 copies the previous doc) and ~2%
  * near-dup embeddings (vec_id % 50 == 1 perturbs the previous vector),
  * so the dedup batteries do real candidate work at scale.
  */
object GenScale {

  /** Uniform [0,1) from (id column, stream tag). */
  private def u(id: org.apache.spark.sql.Column, stream: Int) =
    pmod(xxhash64(id, lit(stream)), lit(1000000L)) / 1000000.0

  def documents(s: SparkSession, n: Long): DataFrame = {
    val base = s.range(n).select(col("id").as("doc_id"),
      // exact-dup plant: every 101st doc duplicates its predecessor
      when(col("id") % 100 === 1, col("id") - 1).otherwise(col("id"))
        .as("eff"))
      .withColumn("len", (lit(30) + pmod(xxhash64(col("eff"), lit(1)),
        lit(171L))).cast("int"))
    // ~35% English stopword mass (keeps lang-ID/quality/curation live on
    // this corpus) + zipf-ish content vocabulary (u^3 concentrates mass
    // on low word ids — hot-shingle stress for the prefix filter)
    val stopWords = array(Seq("the", "a", "is", "and", "of", "to", "in",
      "it", "for", "on", "as", "was").map(lit): _*)
    base.withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), col("len")), i =>
          when(pmod(xxhash64(col("eff"), i + 5000), lit(100L)) < 35,
            element_at(stopWords,
              (pmod(xxhash64(col("eff"), i + 7000), lit(12L)) + 1)
                .cast("int")))
            .otherwise(concat(lit("w"), floor(lit(30000) *
              pow(pmod(xxhash64(col("eff"), i + 100), lit(1000000L)) /
                1000000.0, 3.0)).cast("long"))))))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        element_at(array(lit("web"), lit("book"), lit("code")),
          (pmod(col("eff"), lit(3)) + 1).cast("int")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  def embeddings(s: SparkSession, n: Long): DataFrame = {
    val base = s.range(n).select(col("id").as("vec_id"),
      when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id"))
        .as("eff"),
      (col("id") % 50 === 1).as("near"))
    val dims = (0 until 64).map { d =>
      val v = u(col("eff"), d) - 0.5
      val jitter = (u(col("vec_id"), 200 + d) - 0.5) * 0.02
      when(col("near"), v + jitter).otherwise(v).cast("float")
    }
    base.select(col("vec_id"), array(dims: _*).as("embedding"),
      pmod(col("vec_id"), lit(20)).cast("int").as("label"))
  }

  def events(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("event_id"),
      // 30 days at second granularity. Physical type mirrors the driver
      // data: plain timestamp[us] without timezone (TIMESTAMP_NTZ) since
      // the 2026-08-13 regen; SPARK_GRAFT_EVENTS_TS=ns emits the legacy
      // LongType-ns shape instead so the nanosAsLong path can be
      // scale-tested too (core.EventTime adapts to both).
      {
        val sec = lit(1704067200L) +
          pmod(xxhash64(col("id"), lit(2)), lit(30L * 86400))
        if (sys.env.get("SPARK_GRAFT_EVENTS_TS").contains("ns"))
          (sec * lit(1000000000L)).as("ts")
        else timestamp_seconds(sec).cast("timestamp_ntz").as("ts")
      },
      pmod(xxhash64(col("id"), lit(1)), lit(20000L)).as("user_id"),
      when(u(col("id"), 3) < 0.6, "click")
        .when(u(col("id"), 3) < 0.9, "view")
        .otherwise("purchase").as("event_type"),
      (pmod(xxhash64(col("id"), lit(4)), lit(10000L)) / 100.0).as("value"),
      concat(lit("""{"device":"d"""), pmod(col("id"), lit(5)),
        lit("""","v":"""), pmod(col("id"), lit(7)), lit("}")).as("props"))

  def lineitem(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("l_orderkey"),
      pmod(xxhash64(col("id"), lit(0)), lit(200000L)).as("l_partkey"),
      pmod(xxhash64(col("id"), lit(1)), lit(10000L)).as("l_suppkey"),
      (pmod(col("id"), lit(7)) + 1).cast("int").as("l_linenumber"),
      (lit(1) + pmod(xxhash64(col("id"), lit(2)), lit(50L)))
        .cast("double").as("l_quantity"),
      (lit(900.0) + pmod(xxhash64(col("id"), lit(3)), lit(100000L)) / 100.0)
        .as("l_extendedprice"),
      (pmod(xxhash64(col("id"), lit(4)), lit(11L)) / 100.0).as("l_discount"),
      (pmod(xxhash64(col("id"), lit(6)), lit(9L)) / 100.0).as("l_tax"),
      when(u(col("id"), 7) < 0.25, "R").when(u(col("id"), 7) < 0.5, "A")
        .otherwise("N").as("l_returnflag"),
      when(u(col("id"), 8) < 0.5, "F").otherwise("O").as("l_linestatus"),
      to_timestamp(date_add(to_date(lit("1995-01-01")),
        pmod(xxhash64(col("id"), lit(5)), lit(1642L)).cast("int")))
        .as("l_shipdate"))

  def orders(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(1)), lit(150000L)).as("o_custkey"),
      when(u(col("id"), 9) < 0.45, "F").when(u(col("id"), 9) < 0.75, "O")
        .otherwise("P").as("o_orderstatus"),
      to_timestamp(date_add(to_date(lit("1995-01-01")),
        pmod(xxhash64(col("id"), lit(2)), lit(1642L)).cast("int")))
        .as("o_orderdate"),
      (lit(1000.0) + pmod(xxhash64(col("id"), lit(3)), lit(45000000L)) / 100.0)
        .as("o_totalprice"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")),
        (pmod(xxhash64(col("id"), lit(4)), lit(5)) + 1).cast("int"))
        .as("o_orderpriority"))

  // Dimension tables (schema + value domains mirror the driver testdata,
  // so selective filters — c_mktsegment, c_acctbal > 7000, nation names —
  // stay selective at sf1 instead of degenerating to 0 or all rows).
  def region(s: SparkSession): DataFrame =
    s.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(lit("AFRICA"), lit("AMERICA"), lit("ASIA"),
        lit("EUROPE"), lit("MIDDLE EAST")), (col("id") + 1).cast("int"))
        .as("r_name"))

  def nation(s: SparkSession): DataFrame =
    s.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey"))

  def customer(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0"))
        .as("c_name"),
      pmod(xxhash64(col("id"), lit(11)), lit(25L)).cast("int")
        .as("c_nationkey"),
      (pmod(xxhash64(col("id"), lit(12)), lit(1100000L)) / 100.0 - 1000.0)
        .as("c_acctbal"),
      element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
        lit("HOUSEHOLD"), lit("MACHINERY")),
        (pmod(xxhash64(col("id"), lit(13)), lit(5)) + 1).cast("int"))
        .as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast("string"), 9, "0"))
        .as("s_name"),
      pmod(xxhash64(col("id"), lit(21)), lit(25L)).cast("int")
        .as("s_nationkey"),
      (pmod(xxhash64(col("id"), lit(22)), lit(1000000L)) / 100.0)
        .as("s_acctbal"))

  def part(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("p_partkey"),
      concat(
        element_at(array(lit("large"), lit("hot"), lit("blue"), lit("small"),
          lit("dark"), lit("light")),
          (pmod(xxhash64(col("id"), lit(31)), lit(6)) + 1).cast("int")),
        lit(" "),
        element_at(array(lit("ring"), lit("bolt"), lit("cog"), lit("plate"),
          lit("wire"), lit("tube")),
          (pmod(xxhash64(col("id"), lit(32)), lit(6)) + 1).cast("int")))
        .as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(col("id"), lit(33)), lit(25L)) + 1).as("p_brand"),
      element_at(array(lit("ECONOMY"), lit("LARGE"), lit("MEDIUM"),
        lit("PROMO"), lit("SMALL"), lit("STANDARD")),
        (pmod(xxhash64(col("id"), lit(34)), lit(6)) + 1).cast("int"))
        .as("p_type"),
      (pmod(xxhash64(col("id"), lit(35)), lit(50L)) + 1).cast("int")
        .as("p_size"),
      (lit(900.0) + pmod(xxhash64(col("id"), lit(36)), lit(110000L)) / 100.0)
        .as("p_retailprice"))

  /** Usage: runMain graft.tools.GenScale [outDir] [mult] — `mult`
    * multiplies every FACT cardinality (round-18 verdict item 3's sf10
    * dial: mult=10 → 60M lineitem / 500k documents / 200k embeddings /
    * 10M events); dimension tables (region/nation) stay fixed, and the
    * value DOMAINS (user_id, custkey, partkey moduli) stay fixed too —
    * growth adds rows per key, the way a real corpus grows, so joins
    * get denser rather than the key space inflating with the data. */
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val mult = if (args.length > 1) args(1).toLong else 1L
    val s = graft.core.Sessions.get()
    Seq(
      ("region", region(s)),
      ("nation", nation(s)),
      ("customer", customer(s, 150000 * mult)),
      ("supplier", supplier(s, 10000 * mult)),
      ("part", part(s, 200000 * mult)),
      ("documents", documents(s, 50000 * mult)),
      ("embeddings", embeddings(s, 20000 * mult)),
      ("events", events(s, 1000000 * mult)),
      ("lineitem", lineitem(s, 6000000 * mult)),
      ("orders", orders(s, 1500000 * mult)),
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[genscale] wrote $name")
    }
    s.stop()
  }
}
