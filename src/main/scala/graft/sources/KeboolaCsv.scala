package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.KeboolaManifest

/** Manifest-driven CSV source and quoted CSV sink.
  *
  * Source (S2): declared schema from the manifest — delimiter, enclosure,
  * header flag, column names, per-column base types, optional all-varchar —
  * the Spark rendition of `duckdb.read_csv(path, delimiter, quotechar,
  * header, names, dtype, all_varchar)` (`components/wr-iceberg/src/
  * component.py:65-77`).
  *
  * Sink (K1): `COPY ... (HEADER, DELIMITER ',', FORCE_QUOTE *)`
  * (`components/ex-iceberg/src/component.py:78-84`) becomes
  * `header=true, quoteAll=true`. Timestamps are emitted in a fixed
  * microsecond format so the bytes round-trip.
  *
  * Scale: both paths are plain distributed Spark jobs; the single-file
  * platform contract (when required) is a `coalesce(1)` at the sink, noted
  * as the scalability tradeoff it is.
  */
object KeboolaCsv {

  private val tsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def read(spark: SparkSession, path: String, manifest: KeboolaManifest,
      allVarchar: Boolean = false): DataFrame =
    spark.read
      .schema(manifest.sparkSchema(allVarchar))
      .option("sep", manifest.delimiter)
      .option("quote", manifest.enclosure)
      .option("escape", manifest.enclosure) // CSV doubled-quote escaping
      .option("header", manifest.hasHeader.toString)
      .option("timestampNTZFormat", tsFormat)
      .csv(path)

  def writeQuoted(df: DataFrame, path: String, delimiter: String = ",",
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("sep", delimiter)
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      // FORCE_QUOTE * preserves whitespace exactly; Spark's CSV *writer*
      // trims by default (reader does not) — disable to keep byte fidelity.
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("timestampNTZFormat", tsFormat)
      .csv(path)
  }
}
