package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Csv

/** Golden end-to-end F1 pipeline test (SURVEY.md §5.2.2): hand-written
  * bronze fixture → champions → feature store → ABT, with exact expected
  * values covering the reference's semantic edge cases:
  *  - empty CSV Position → NULL → COALESCE sentinel 99 (P2);
  *  - SUM over STRING Points (A11 coercion);
  *  - sprint-less driver → NULL sprint aggregates (feeds the imputers);
  *  - exact interpolating PERCENTILE medians (A6);
  *  - int dtYear = string year join coercion (J3);
  *  - two rounds on one date → row multiplication (J2).
  */
class F1Spec extends SparkSpec {

  private val header =
    "DriverId;TeamId;Position;GridPosition;Status;Points;Laps;identifier;date;year;RoundNumber;Location"

  private def fixture: String = {
    val dir = tmpDir("f1")
    val rows = Seq(
      // 2023 R1, Bahrain
      "max;redbull;1.0;1.0;Finished;25.0;57;race;2023-03-05 14:00:00;2023;1;Bahrain",
      "lewis;mercedes;2.0;2.0;Finished;18.0;57;race;2023-03-05 14:00:00;2023;1;Bahrain",
      "nico;ferrari;3.0;3.0;Finished;15.0;57;race;2023-03-05 14:00:00;2023;1;Bahrain",
      // 2023 R2, Montreal — lewis DNF: EMPTY Position cell
      "max;redbull;1.0;2.0;Finished;25.0;70;race;2023-06-10 18:00:00;2023;2;Montreal",
      "lewis;mercedes;;1.0;DNF;0.0;12;race;2023-06-10 18:00:00;2023;2;Montreal",
      "nico;ferrari;2.0;3.0;Finished;18.0;70;race;2023-06-10 18:00:00;2023;2;Montreal",
      // 2024 R1 sprint (nico has NO sprints at all)
      "max;redbull;1.0;1.0;Finished;8.0;17;sprint;2024-03-02 12:00:00;2024;1;Jeddah",
      "lewis;mercedes;2.0;2.0;Finished;7.0;17;sprint;2024-03-02 12:00:00;2024;1;Jeddah",
      // 2024 R1 race
      "max;redbull;2.0;1.0;Finished;18.0;50;race;2024-03-03 14:00:00;2024;1;Jeddah",
      "lewis;mercedes;1.0;2.0;Finished;25.0;50;race;2024-03-03 14:00:00;2024;1;Jeddah",
      "nico;ferrari;3.0;3.0;Finished;15.0;50;race;2024-03-03 14:00:00;2024;1;Jeddah",
      // 2024 R2 — nico DNF with empty Position
      "max;redbull;1.0;1.0;Finished;25.0;53;race;2024-06-15 14:00:00;2024;2;Barcelona",
      "lewis;mercedes;2.0;2.0;Finished;18.0;53;race;2024-06-15 14:00:00;2024;2;Barcelona",
      "nico;ferrari;;4.0;DNF;0.0;3;race;2024-06-15 14:00:00;2024;2;Barcelona",
    )
    Files.writeString(Paths.get(dir, "results.csv"),
      (header +: rows).mkString("\n"))
    dir
  }

  private lazy val bronze = Csv.readBronze(spark, s"$fixture/*.csv")

  test("champions: SUM over string Points, top-1 per season") {
    val ch = F1.champions(bronze)
      .orderBy("year").collect().toSeq
    assert(ch.map(r => (r.getString(0), r.getString(1), r.getDouble(2))) ===
      Seq(("2023", "max", 50.0), ("2024", "max", 51.0)))
  }

  test("feature store at 2024-06-15: golden values incl. sentinel-99 and NULL sprints") {
    val fs = F1.featureStore(bronze, "2024-06-15")
    val byDriver = fs.collect().map(r => r.getAs[String]("DriverId") -> r).toMap
    assert(byDriver.keySet === Set("max", "lewis", "nico"))

    val max = byDriver("max")
    assert(max.getAs[Long]("qtdRuns") === 5)
    assert(max.getAs[Long]("qtdRaces") === 4)
    assert(max.getAs[Long]("qtdSprints") === 1)
    assert(max.getAs[Long]("qtdWins") === 4)
    assert(max.getAs[Long]("qtdPodiums") === 5)
    assert(max.getAs[Long]("qtdPoles") === 4)
    assert(max.getAs[Double]("avgPosRace") === 1.25)
    assert(max.getAs[Double]("medianPosRace") === 1.0)
    assert(max.getAs[Double]("avgGainRace") === 0.0)
    assert(max.getAs[Double]("totalPointsCurrentTemp") === 51.0)
    assert(max.getAs[String]("tempRoundNumber") === "2")

    val lewis = byDriver("lewis")
    // DNF row: empty Position → NULL → COALESCE 99
    assert(lewis.getAs[Double]("avgPosRace") === (2.0 + 99 + 1 + 2) / 4)
    assert(lewis.getAs[Double]("medianPosRace") === 2.0) // exact percentile
    assert(lewis.getAs[Double]("totalPointsCurrentTemp") === 50.0)

    val nico = byDriver("nico")
    // no sprints ever → NULL sprint aggregates (imputer input)
    assert(nico.isNullAt(nico.fieldIndex("avgPosSprint")))
    assert(nico.isNullAt(nico.fieldIndex("medianPosSprint")))
    assert(nico.getAs[Long]("qtdSprints") === 0)
    assert(nico.getAs[Double]("avgPosRaceCurrentTemp") === (3.0 + 99) / 2)
  }

  test("point-in-time cut: history strictly <= reference date") {
    val fs = F1.featureStore(bronze, "2023-12-31")
    val max = fs.filter(col("DriverId") === "max").head()
    assert(max.getAs[Long]("qtdRuns") === 2) // only the 2023 races
    // current season (2023) totals exclude 2024 entirely
    assert(max.getAs[Double]("totalPointsCurrentTemp") === 50.0)
  }

  test("ABT: flChamp via int-year = string-year coercion join") {
    val ch = F1.champions(bronze)
    val abt = F1.abt(F1.featureStore(bronze, "2024-06-15"), ch)
    val flags = abt.select("DriverId", "flChamp").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(flags === Map("max" -> 1, "lewis" -> 0, "nico" -> 0))
  }

  test("two rounds sharing a date multiply feature rows (reference semantic)") {
    val dir = tmpDir("f1dup")
    val rows = Seq(
      "max;redbull;1.0;1.0;Finished;25.0;57;race;2024-06-15 10:00:00;2024;2;SpaA",
      "max;redbull;2.0;1.0;Finished;18.0;57;race;2024-06-15 16:00:00;2024;3;SpaB",
    )
    Files.writeString(Paths.get(dir, "r.csv"), (header +: rows).mkString("\n"))
    val fs = F1.featureStore(Csv.readBronze(spark, s"$dir/*.csv"), "2024-06-15")
    // one driver, but two distinct (dtEvent, RoundNumber) rows on the ref
    // date → 2 output rows, exactly like the reference's left join
    assert(fs.count() === 2)
    assert(fs.select("tempRoundNumber").as[String](spark.implicits.newStringEncoder)
      .collect().toSet === Set("2", "3"))
  }
}
