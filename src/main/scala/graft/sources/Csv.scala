package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze-layer CSV ingestion (reference scripts/02_bronze.py:35-109):
  * many `;`-separated CSVs with a header row and NO schema inference —
  * every column arrives as StringType, downstream behavior relies on
  * explicit casts / Spark coercion exactly like the reference (SURVEY.md
  * §1.2). Globs resolve natively in the reader; emptiness is checked
  * up-front (reference fails with "No objects to process").
  */
object Csv {

  /** S1+S2: read a directory/glob of `;`-CSVs, all-string schema.
    * @throws IllegalArgumentException if the glob matches no files. */
  def readBronze(spark: SparkSession, pattern: String): DataFrame = {
    val hp = new Path(pattern)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hp)).map(_.length).getOrElse(0)
    require(matched > 0, s"No objects to process: $pattern")
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .csv(pattern)
  }
}
