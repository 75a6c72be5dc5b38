package graft.core

import graft.SparkSpec

/** Lifecycle contract of the shared artifact registry: content-keyed
  * hits, recompute on in-place regeneration, and — the part a plain
  * fingerprint key misses — eviction + release of the superseded
  * generation, so a long-lived driver never accumulates stale pinned
  * frames across source regenerations. */
class RegistrySpec extends SparkSpec {

  private def touch(dir: String, name: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.writeString(p, content)
    // mtime granularity can swallow fast successive writes — force it
    p.toFile.setLastModified(p.toFile.lastModified() + 2000)
  }

  test("same content hits; regeneration recomputes, evicts and releases " +
    "the superseded entry; distinct dirs are independent") {
    val dirA = tmpDir("reg-a")
    val dirB = tmpDir("reg-b")
    touch(dirA, "t.parquet", "v1")
    touch(dirB, "t.parquet", "v1")
    var computes = 0
    val released = scala.collection.mutable.ArrayBuffer[Int]()
    val reg = new Registry[Int](released += _)
    def get(dir: String): Int =
      reg.getOrCompute(spark, dir) { computes += 1; computes }

    assert(get(dirA) === 1)
    assert(get(dirA) === 1) // hit: same session+dir+content
    assert(computes === 1 && released.isEmpty)

    assert(get(dirB) === 2) // other dir: own entry, no eviction
    assert(reg.size === 2)

    touch(dirA, "t.parquet", "v2-regenerated") // in-place regeneration
    assert(get(dirA) === 3) // recompute against new content...
    assert(released.toSeq === Seq(1)) // ...and the stale artifact released
    assert(reg.size === 2) // one generation per (session, dir)

    assert(get(dirB) === 2) // untouched dir unaffected
    assert(get(dirA) === 3)
    assert(computes === 3)
  }
}
