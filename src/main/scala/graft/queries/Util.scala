package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One verifiable operator: a Spark DataFrame program plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables. Queries with no
  * SQL-expressible oracle get a rows-only check from the driver.
  */
final case class QDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QUtil {

  /** Load one of the driver-generated test tables (TESTDATA.md).
    *
    * `events.ts` is nanosecond-precision parquet, which Spark cannot read
    * natively; with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    * a nanos LongType, which we truncate to microseconds (matching DuckDB's
    * ns->us truncation) and restore to a timestamp.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Exact (order-insensitive) sum of a double expression, returned as double.
    *
    * Floating-point sums are order-sensitive, and Spark/DuckDB accumulate in
    * different orders — so a plain SUM(double) hash-mismatches the oracle.
    * Casting every addend to a decimal first makes the reduction exact and
    * associative; both engines then produce the identical value, and the final
    * decimal->double conversion is deterministic (nearest double of the same
    * exact decimal). The per-row double arithmetic *inside* the addend is
    * IEEE-754, identical in both engines.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(22, 8))).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(22, 8))).cast(DoubleType) / count(lit(1))

  /** DuckDB-side spelling of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(22,8))) AS DOUBLE)"

  /** DuckDB-side spelling of [[davg]]. */
  def davgSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(22,8))) AS DOUBLE) / COUNT(*)"
}
