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
    // Exactness bound: beyond |x·10^scale| ≈ 2^53 doubles have no
    // fractional part left, so the floor is the identity and the result
    // is (x·10^s)/10^s — exactly what DuckDB's floor form computes too.
    val p = math.pow(10.0, scale)
    // The floor must stay DOUBLE-typed: Spark's floor() returns LongType,
    // which silently CLAMPS beyond ±2^63 — a float32-max magnitude like
    // 1e38 at scale 6 came back as Long.MaxValue/10^6 ≈ 9.2e12 while
    // DuckDB's double floor round-tripped the value (caught by the
    // hostile-vector differential). x − pmod(x, 1) IS floor(x) for every
    // finite double (pmod's remainder is non-negative), stays in double,
    // and propagates NaN. ±Infinity still needs the explicit guard:
    // pmod(±Inf, 1) is NaN, where DuckDB's floor keeps the infinity.
    // Guard on the SCALED value, not the input: a finite x whose x·10^s+0.5
    // overflows to ±Inf must come back as ±Inf (DuckDB's floor(±Inf)/p is
    // ±Inf), and an infinite x scales to the same-signed infinity, so the
    // one guard covers both. pmod(±Inf, 1) would be NaN otherwise.
    val scaled = c * p + lit(0.5)
    when(abs(scaled) === lit(Double.PositiveInfinity), scaled / p)
      .otherwise((scaled - pmod(scaled, lit(1.0))) / p)
  }
}
