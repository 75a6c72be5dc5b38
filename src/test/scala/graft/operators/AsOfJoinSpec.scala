package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** asofBackward ≡ a naive per-left-row scan, on generated data with
  * shared keys, duplicate timestamps, and unmatched rows. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val leftGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 50L), Gen.choose(0, 999)))
  private val rightGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 50L), Gen.choose(1000, 1999)))

  test("asofBackward equals the naive latest-at-or-before lookup") {
    (1 to 6).foreach { i =>
      val lrows = leftGen.pureApply(Gen.Parameters.default, Seed(11L + i))
      val rrows = rightGen.pureApply(Gen.Parameters.default, Seed(77L + i))
        .distinctBy(t => (t._1, t._2)) // unique (key, ts) on the right
      val left = lrows.toDF("k", "ts", "lv")
      val right = rrows.toDF("k", "ts", "rid")
      val got = AsOfJoin.asofBackward(left, right, Seq("k"), "ts",
        leftCols = Seq("lv"), rightCols = Seq("rid"), tieBreak = "rid")
        .select("k", "ts", "lv", "asof_rid")
        .as[(Int, Long, Int, Option[Int])].collect().sorted.toSeq
      val expect = lrows.map { case (k, ts, lv) =>
        val m = rrows.filter(r => r._1 == k && r._2 <= ts)
        (k, ts, lv, m.sortBy(r => (r._2, r._3)).lastOption.map(_._3))
      }.sorted
      assert(got === expect)
    }
  }
}
