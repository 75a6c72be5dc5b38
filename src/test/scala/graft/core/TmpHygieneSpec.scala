package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The cross-JVM tmp-dir sweep: dead-pid dirs reclaimed, live-pid dirs
  * and non-graft entries untouched (the correctness half — space
  * reclamation must never delete a CONCURRENT JVM's staging). */
class TmpHygieneSpec extends AnyFunSuite {

  private def mk(name: String): java.io.File = {
    val d = new java.io.File(sys.props("java.io.tmpdir"), name)
    d.mkdirs()
    new java.io.File(d, "marker").createNewFile()
    d
  }

  test("sweep deletes dead-pid graft dirs, keeps live-pid and foreign ones") {
    // a pid that cannot be a live process (beyond any kernel pid_max)
    val deadPid = 1999999999L
    assert(ProcessHandle.of(deadPid).isEmpty, "test pid unexpectedly live")
    val dead = mk(s"graft-spec-sweep-p$deadPid")
    val deadSink = mk(s"graft-spec-sweep-sink-p$deadPid-c3")
    val live = mk(s"graft-spec-sweep-p${ProcessHandle.current.pid}")
    val foreign = mk("graft-spec-sweep-nopid") // no -p<pid> suffix
    try {
      TmpHygiene.sweepNow()
      assert(!dead.exists(), "dead-pid dir survived the sweep")
      assert(!deadSink.exists(), "dead-pid -c<n> sink dir survived")
      assert(live.exists(), "live-pid dir was deleted")
      assert(foreign.exists(), "non-pid-keyed dir was deleted")
    } finally {
      Seq(dead, deadSink, live, foreign).foreach(
        org.apache.commons.io.FileUtils.deleteQuietly)
    }
  }

  test("legacy branch: aged staging/sink/store dirs reclaimed; data " +
    "dirs (graft-sf1) and young legacy dirs survive") {
    val oldMs = System.currentTimeMillis() - 7L * 3600 * 1000
    def age(f: java.io.File): Unit = { f.setLastModified(oldMs); () }
    val oldStream = mk("graft-stream-spec-legacy")
    val oldSink = mk("graft-d12spec-sink-deadbeef")
    val oldStore = mk("graft-i1-store-deadbeef")
    val dataDir = mk("graft-sf1-spec") // GenScale-style dataset: NEVER swept
    val young = mk("graft-stream-spec-young") // in-use window: kept
    Seq(oldStream, oldSink, oldStore, dataDir).foreach(age)
    try {
      TmpHygiene.sweepNow()
      assert(!oldStream.exists(), "aged legacy stream dir survived")
      assert(!oldSink.exists(), "aged legacy sink dir survived")
      assert(!oldStore.exists(), "aged legacy store dir survived")
      assert(dataDir.exists(),
        "dataset dir outside the enumerated legacy families was deleted")
      assert(young.exists(), "young legacy-format dir was deleted")
    } finally {
      Seq(oldStream, oldSink, oldStore, dataDir, young).foreach(
        org.apache.commons.io.FileUtils.deleteQuietly)
    }
  }
}
