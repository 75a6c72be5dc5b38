package graft.core

import org.apache.spark.sql.SparkSession

/** Session-lifetime registry for per-(session, dir) computed artifacts —
  * the persisted silver frames (Dedup's shingle stage, MlQueries' ABT)
  * and fitted models that several queries share.
  *
  * Keys carry the CONTENT fingerprint of the source dir
  * ([[Tables.sourceFingerprint]]): if the driver regenerates testdata in
  * place, the stale entry no longer matches and a fresh artifact is
  * computed against the new bytes. The fingerprint alone, however, only
  * prevents STALE READS — the superseded entry would stay pinned in the
  * map (and its frame in the Spark block store) for the process
  * lifetime, growing unboundedly across regenerations. So a miss first
  * EVICTS every entry of the same (session, dir) with a different
  * fingerprint, running the `release` hook (unpersist) on each — the
  * registry holds at most one generation per source, which also bounds
  * its size at one entry per distinct (session, dir) pair, the contract
  * a shared long-lived 100 TB driver needs.
  *
  * Compute runs under the registry lock: artifacts here are expensive
  * one-shot builds (a corpus-wide hash pass, an RF fit) and a racing
  * duplicate would double-persist; per-instance locking keeps unrelated
  * registries (shingles vs models) independent.
  */
final class Registry[V](release: V => Unit) {

  private final case class Key(session: SparkSession, dir: String,
                               fingerprint: String)

  private val entries = scala.collection.mutable.LinkedHashMap[Key, V]()

  def getOrCompute(s: SparkSession, dir: String)(compute: => V): V = {
    val key = Key(s, dir, Tables.sourceFingerprint(dir))
    synchronized {
      entries.get(key) match {
        case Some(v) => v
        case None =>
          val superseded = entries.keys
            .filter(k => (k.session eq s) && k.dir == dir &&
              k.fingerprint != key.fingerprint)
            .toSeq
          superseded.foreach { k =>
            entries.remove(k).foreach(release)
          }
          val v = compute
          entries.put(key, v)
          v
      }
    }
  }

  /** Entry count — eviction observability for specs/diagnostics. */
  def size: Int = synchronized(entries.size)
}
