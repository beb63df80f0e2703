package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions re-expressing the reference's row-wise
  * python helpers (/root/reference/task.py:43-60) as codegen-friendly
  * Catalyst expression trees — no UDFs, so they inline into
  * whole-stage codegen and stay ANSI-SQL-expressible for the oracle.
  */
object TextFns {

  /** First-space name split (task.py:55 `nsplit`): returns the part
    * before the first space, or the whole string when no space.
    */
  def firstWord(c: Column): Column = {
    val pos = locate(" ", c)
    when(pos > 0, c.substr(lit(1), pos - 1)).otherwise(c)
  }

  /** Remainder after the first space ('' when no space) — task.py:60. */
  def restWords(c: Column): Column = {
    val pos = locate(" ", c)
    when(pos > 0, c.substr(pos + 1, length(c))).otherwise(lit(""))
  }

  /** Deterministic gender-from-name heuristic standing in for the
    * reference's dictionary lookup (task.py:43, gender_guesser). A
    * last-character suffix rule — crude linguistically but exactly
    * reproducible in ANSI SQL for the DuckDB gate:
    * a/e/i/y → female; o/n/r/s/d/t/h/l/k/m → male; else unknown.
    */
  def genderGuess(c: Column): Column = {
    val last = substring(lower(trim(c)), -1, 1)
    when(last.isin("a", "e", "i", "y"), "female")
      .when(last.isin("o", "n", "r", "s", "d", "t", "h", "l", "k", "m"), "male")
      .otherwise("unknown")
  }

  /** The same heuristic as ANSI SQL over a column reference. */
  def genderGuessSql(col: String): String =
    s"""CASE WHEN right(lower(trim($col)), 1) IN ('a','e','i','y') THEN 'female'
        WHEN right(lower(trim($col)), 1) IN ('o','n','r','s','d','t','h','l','k','m') THEN 'male'
        ELSE 'unknown' END"""
}
