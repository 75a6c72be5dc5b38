package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StringType

import graft.SparkSpec

/** S1/S2 bronze CSV semantics: `;` separator, header, NO inference —
  * every column StringType (reference scripts/02_bronze.py:97). */
class CsvSpec extends SparkSpec {

  test("readBronze: all-string schema, ; separator, header") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "a.csv"),
      "Position;Points;DriverId\n1;25.0;max\n;0;nico\n")
    Files.writeString(Paths.get(dir, "b.csv"),
      "Position;Points;DriverId\n2.0;18;lewis\n")
    val df = Csv.readBronze(spark, s"$dir/*.csv")
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.columns.toSeq === Seq("Position", "Points", "DriverId"))
    assert(df.count() === 3)
    // empty CSV cell → NULL (feeds COALESCE(INT(FLOAT(x)), 99) downstream)
    assert(df.filter(df("Position").isNull).count() === 1)
  }

  test("readBronze: empty glob fails fast") {
    val dir = tmpDir("csvempty")
    val e = intercept[IllegalArgumentException] {
      Csv.readBronze(spark, s"$dir/*.csv")
    }
    assert(e.getMessage.contains("No objects to process"))
  }
}
