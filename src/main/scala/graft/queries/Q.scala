package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shared helpers for the oracle-checked query packs.
  *
  * Determinism rules (driver hashes values after sorting columns by name):
  *   - every query's rows are sorted by all output columns, name order, with
  *     Spark's null-first ASC semantics; oracle SQL appends the matching
  *     `ORDER BY "c1" NULLS FIRST, ...`;
  *   - floating sums go through integer cents (`cast(round(x*100) as bigint)`)
  *     so summation order cannot produce last-ulp drift between engines;
  *   - per-row float math uses identical expression trees in both engines and
  *     is rounded to 6 decimals.
  */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables.table(s, dir, name)

  /** Deterministic row order: all columns, sorted by name, nulls first. */
  def sortAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.sorted.map(c => col(c).asc_nulls_first): _*)

  /** Oracle-side ORDER BY matching [[sortAll]]. */
  def orderBySql(cols: String*): String =
    "ORDER BY " + cols.sorted.map(c => s"$c NULLS FIRST").mkString(", ")

  /** Exact integer cents of a 2-decimal double — identical in Spark/DuckDB. */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
