package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** Validated CSV contact source (reference S1/S2: csv.DictReader split into
  * valid/invalid by vocabulary, idrt/data.py:191-209; pandas
  * keep_default_na=False -> empty strings, never NULL/NaN,
  * idrt/data.py:378,423).
  */
object CsvContacts {

  /** Header CSV -> DataFrame with all columns coalesced to empty string
    * (the reference's no-NaN semantics).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", null) // leave values untouched
      .csv(path)
    raw.select(raw.columns.map(c => Normalize.emptyIfNull(col(c)).as(c)): _*)
  }

  /** (valid, invalid) split by the printable-vocabulary gate over every
    * column (reference: idrt/data.py:175-189 valid_row).
    */
  def readSplit(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val df = read(spark, path)
    val gate = Normalize.isValidRow(df.columns.map(col))
    (df.filter(gate), df.filter(!gate))
  }
}
