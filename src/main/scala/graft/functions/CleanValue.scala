package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric cleaning + unit-conversion expressions for the weather ETL.
  *
  * Re-expresses the reference's per-cell Python lambdas
  * (`/root/reference/etl_meteo.py:41-46,53-59,92-105`) as native Column
  * expressions so they run inside whole-stage codegen — no UDFs. All
  * functions are null-preserving (null in → null out) to match the
  * reference's `pd.isna` gates and `errors='coerce'` semantics.
  */
object CleanValue {

  /** Strings accepted as numbers after cleaning ("12", "-3.5", ".7", "1e-3"). */
  private val NumericPattern = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  /** Unit suffixes + whitespace stripped by the reference's `clean_value`
    * (`etl_meteo.py:44`): spaces, °F, mph, in, w/m², %.
    */
  private val UnitSuffixPattern = "\\s|°F|mph|in|w/m²|%"

  /** Parse a unit-suffixed, decimal-comma numeric string to double; null on
    * failure. Replicates `clean_value` (`etl_meteo.py:41-46`): the ","→"."
    * replacement runs BEFORE suffix stripping, and unparseable values
    * (including "NaN" / "") become null rather than erroring. The numeric
    * regex guard makes the cast conf-independent (same result whether or
    * not ANSI mode is on).
    */
  def cleanValue(c: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(c.cast("string"), ",", "."),
      UnitSuffixPattern, "")
    when(cleaned.rlike(NumericPattern), cleaned.cast("double"))
  }

  /** Parse an already-clean numeric string; ''/null → null; junk → null.
    * Replicates the JSON-path falsy gate `float(x) if x else None`
    * (`etl_meteo.py:98-100`) — note `"0"` is truthy in Python so zero
    * survives, which the regex guard also preserves.
    */
  def numOrNull(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNotNull && s =!= "" && s.rlike(NumericPattern), s.cast("double"))
  }

  /** `float(x or 0)` semantics (`etl_meteo.py:92`): null/''/absent → 0.0.
    * A non-empty UNPARSEABLE string coerces to NULL, not 0 — the
    * reference's float() RAISES there, and per-row raising isn't an
    * option in a distributed scan; recording junk as a legitimate 0
    * measurement would fabricate data the audits can never see, while
    * null keeps the bad cell visible (null-count report, F6).
    */
  def numOrZero(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull || s === "", lit(0.0)).otherwise(numOrNull(c))
  }

  // Unit conversions (etl_meteo.py:53-57,92) — plain arithmetic; Catalyst
  // constant-folds the factors and propagates nulls natively.
  def fahrenheitToCelsius(c: Column): Column = (c - lit(32.0)) * lit(5.0) / lit(9.0)
  def inHgToHpa(c: Column): Column          = c * lit(33.8638)
  def mphToMs(c: Column): Column            = c * lit(0.44704)
  def inchesToMm(c: Column): Column         = c * lit(25.4)
  def kmhToMs(c: Column): Column            = c / lit(3.6)
}
