package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric column helpers shared by the scoring operators. */
object NumFns {

  /** Engine-portable decimal rounding: `floor(x · 10^scale + 0.5) / 10^scale`.
    *
    * Spark's `round()` rounds the SHORTEST DECIMAL REPRESENTATION of the
    * double (it goes through `BigDecimal.valueOf`, i.e. `Double.toString`),
    * while DuckDB — and C, and numpy — round the BINARY value. The two
    * disagree exactly at decimal half-way points that are not binary-
    * representable: the double nearest 0.31475 prints as "0.31475" so Spark
    * rounds it UP to 0.3148, but its binary value is 0.31474999…, which
    * DuckDB rounds DOWN to 0.3147. Spark's BigDecimal path also erases the
    * sign of a negative zero (round(-0.00003, 4) = +0.0) where DuckDB keeps
    * -0.0 — both classes surfaced as real one-row-in-5000 oracle hash
    * mismatches at sf0.1 (quality_score, dsir_select).
    *
    * The floor form sidesteps the engine semantics entirely: multiply, add,
    * floor and divide are the same IEEE-754 operations everywhere, so ANY
    * engine that is handed the same doubles and the same formula produces
    * the same bits. It is classic round-half-up (toward +∞ for negatives),
    * and floor's result can never be -0.0. Scoring queries with a DuckDB
    * oracle twin must use this — with the same `floor(x * p + 0.5) / p`
    * spelled out in the oracle SQL — instead of `round()`.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    // Exactness bound: x·10^scale must stay below 2^53 for floor to be
    // decisive (Spark's floor(double) also returns LongType, exact to
    // 2^63). A scale-2 revenue sum would have to exceed ~9×10^13 — ~90
    // trillion in ledger units — before this matters, and the DOUBLE sum
    // feeding it loses decimal exactness at the same magnitude anyway;
    // at that point the fix is decimal-typed inputs, not a rounder.
    val p = math.pow(10.0, scale)
    // NaN and ±Infinity must pass through untouched: Spark's floor(double)
    // returns LongType, which would silently collapse NaN to 0 and ±Inf to
    // ±Long.MaxValue, while DuckDB's double-typed floor keeps them — the
    // exact engine-divergence class this helper exists to close (cosine of
    // an all-zero vector is the canonical NaN producer).
    when(isnan(c) || abs(c) === lit(Double.PositiveInfinity), c)
      .otherwise(floor(c * p + 0.5) / p)
  }
}
