package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed REGISTRY.md must match what the code generates —
  * otherwise the index the judge reads and the registry the engine
  * runs drift apart silently (the failure mode SURVEY §2.12's prose
  * table had). On failure: `sbt "runMain graft.tools.RegistryIndex"`. */
class RegistryIndexSpec extends AnyFunSuite {

  test("committed REGISTRY.md matches the generated registry index") {
    val regPath = java.nio.file.Paths.get("REGISTRY.md")
    val gatePath = java.nio.file.Paths.get("BASELINE_GATE.json")
    assume(java.nio.file.Files.exists(regPath), "REGISTRY.md not in cwd")
    val gate =
      if (java.nio.file.Files.exists(gatePath))
        Some(java.nio.file.Files.readString(gatePath))
      else None
    val committed = java.nio.file.Files.readString(regPath)
    val generated = graft.tools.RegistryIndex.render(gate)
    assert(committed === generated,
      "REGISTRY.md is stale — regenerate: sbt \"runMain graft.tools.RegistryIndex\"")
  }
}
