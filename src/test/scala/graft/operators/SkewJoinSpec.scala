package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Salted join ≡ plain join, for inner and left joins, on skewed data
  * (one hot key dominating) — the property that makes the helper safe to
  * drop into any plan. */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // skewed generator: ~70% of rows on key 0
  private val probeGen = Gen.nonEmptyListOf(
    Gen.frequency(7 -> Gen.const(0), 3 -> Gen.choose(1, 9))
      .flatMap(k => Gen.choose(0, 1000).map(v => (k, v))))
  private val buildGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 12), Gen.alphaStr.map(_.take(4))))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("saltedJoin(inner) equals plain inner join under skew") {
    (1 to 5).foreach { i =>
      val probe = sample(probeGen, 100L + i).toDF("k", "v")
      val build = sample(buildGen, 200L + i).toDF("k", "name")
      val expected = probe.join(build, Seq("k"), "inner")
        .as[(Int, Int, String)].collect().sorted.toSeq
      val got = SkewJoin.saltedJoin(probe, build, Seq("k"), salt = 4)
        .select("k", "v", "name")
        .as[(Int, Int, String)].collect().sorted.toSeq
      assert(got === expected)
    }
  }

  test("saltedJoin(left) preserves unmatched probe rows exactly once") {
    (1 to 5).foreach { i =>
      val probe = sample(probeGen, 300L + i).toDF("k", "v")
      val build = sample(buildGen, 400L + i).toDF("k", "name")
      val expected = probe.join(build, Seq("k"), "left")
        .as[(Int, Int, Option[String])].collect().sorted.toSeq
      val got = SkewJoin.saltedJoin(probe, build, Seq("k"), salt = 3, "left")
        .select("k", "v", "name")
        .as[(Int, Int, Option[String])].collect().sorted.toSeq
      assert(got === expected)
    }
  }
}
