package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins (SURVEY.md §7.4 "salted /
  * AQE-skew-tolerant joins").
  *
  * AQE's skew-join split (on by default in graft.core.Sessions) handles
  * most sort-merge skew at runtime; salting remains the tool when
  *  - the plan isn't eligible (e.g. the skewed side feeds a window or a
  *    bucketed/co-located join that AQE won't re-split), or
  *  - key skew is so extreme one key exceeds a single task's memory even
  *    after AQE's split factor.
  *
  * Mechanics: the probe side gets a DETERMINISTIC per-row salt in
  * [0, salt) (hash of the whole row, not rand() — keeps retries/replays
  * stable); the build side is replicated `salt`× with every salt value;
  * the join key becomes (key, salt). Hot keys now spread across `salt`
  * tasks. Build-side cost: `salt`× replication — use for dimension-sized
  * build sides, which is exactly the skewed-fact-join case.
  */
object SkewJoin {

  /** Join types preserving correctness under build-side replication:
    * unmatched BUILD rows must never be emitted (each would appear once
    * per salt replica). Right/full-outer are therefore rejected. */
  private val supported = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(supported.contains(joinType.toLowerCase.replace("_", "")) ||
      supported.contains(joinType.toLowerCase),
      s"saltedJoin does not support '$joinType': replicated build rows " +
        "would duplicate right/full-outer null-extensions")
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salt)))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedProbe.join(replicatedBuild, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
