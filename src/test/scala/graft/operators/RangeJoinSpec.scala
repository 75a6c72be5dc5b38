package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Binned range join ≡ naive containment scan, across bin-boundary
  * intervals and varying granularities (width always <= g). */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val ptsGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 200L), Gen.choose(0, 99)))
  private val ivsGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 190L), Gen.choose(0L, 10L),
      Gen.choose(100, 199)))

  test("pointsInIntervals equals the naive containment join") {
    (1 to 6).foreach { i =>
      val prows = ptsGen.pureApply(Gen.Parameters.default, Seed(5L + i))
      val irows = ivsGen.pureApply(Gen.Parameters.default, Seed(55L + i))
        .map { case (k, lo, w, id) => (k, lo, lo + w, id) } // width <= 10
      val points = prows.toDF("k", "pt", "pid")
      val ivs = irows.toDF("k", "lo", "hi", "iid")
      val got = RangeJoin.pointsInIntervals(points, ivs, Seq("k"),
        "pt", "lo", "hi", g = 10L)
        .select("k", "pid", "iid")
        .as[(Int, Int, Int)].collect().sorted.toSeq
      val expect = (for {
        (pk, pt, pid) <- prows
        (ik, lo, hi, iid) <- irows
        if pk == ik && pt >= lo && pt <= hi
      } yield (pk, pid, iid)).sorted
      assert(got === expect)
    }
  }
}
