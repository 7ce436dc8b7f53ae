package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the engine-portable rounding contract (NumFns.roundHalfUp) and the
  * two divergence classes it exists to close — both surfaced as real
  * one-row oracle hash mismatches when the DuckDB compare first ran at
  * sf0.1 (quality_score, dsir_select).
  */
class NumFnsSpec extends SparkSpec {

  import spark.implicits._

  private def rhu(x: Double, s: Int): Double =
    Seq(x).toDF("x").select(NumFns.roundHalfUp(col("x"), s).as("r"))
      .collect()(0).getDouble(0)

  test("rounds the BINARY value, not the shortest decimal repr") {
    // 0.31475 is not binary-representable; the nearest double PRINTS as
    // "0.31475" but IS 0.31474999…, so Spark's round() (shortest-repr,
    // HALF_UP) says 0.3148 while any binary-value rounder — DuckDB, C,
    // numpy — says 0.3147. roundHalfUp must take the binary side.
    val boundary = 0.31475 // parses to the double below the decimal value
    assert(rhu(boundary, 4) == 0.3147)
    val sparkRound = Seq(boundary).toDF("x")
      .select(round(col("x"), 4)).collect()(0).getDouble(0)
    assert(sparkRound == 0.3148, "if this fails, Spark changed round() semantics")
    // a binary-EXACT tie (0.15625 = 5/32, ×10⁴ = 1562.5 exactly) rounds up
    assert(rhu(0.15625, 4) == 0.1563)
  }

  test("never emits negative zero") {
    // Spark's BigDecimal round erases -0.0's sign too, but DuckDB's
    // round() keeps it and the driver's hash stringifies "-0" ≠ "0";
    // floor-form can't produce -0.0 at all (floor(0.2) = 0, positive).
    val r = rhu(-0.00003, 4)
    assert(r == 0.0 && (1.0 / r) > 0, s"expected +0.0, got $r (sign bit set)")
  }

  test("NaN and infinities pass through (floor->Long would collapse them)") {
    assert(rhu(Double.NaN, 4).isNaN)
    assert(rhu(Double.PositiveInfinity, 4) == Double.PositiveInfinity)
    assert(rhu(Double.NegativeInfinity, 4) == Double.NegativeInfinity)
  }

  test("huge magnitudes survive (Long floor would clamp at 2^63)") {
    // a float32-max-scale value: 1e38 × 10^6 = 1e44 ≫ Long.MaxValue. The
    // old floor()-based form clamped this to Long.MaxValue/10^6 ≈ 9.2e12
    // (caught by the hostile-vector differential on embed_quantize's
    // q_scale); the pmod floor stays in double and must match DuckDB's
    // double floor round-trip exactly.
    val x = 1e38
    val expected = { val s = x * 1e6 + 0.5; (s - s % 1.0) / 1e6 }
    assert(rhu(x, 6) == expected)
    assert(rhu(x, 6) > 9e37, "must not collapse to the Long-clamp value")
    val xn = -1e38
    val expectedN = { val s = xn * 1e6 + 0.5; val m = s % 1.0
      (s - (if (m < 0) m + 1.0 else m)) / 1e6 }
    assert(rhu(xn, 6) == expectedN)
  }

  test("finite input whose scaling overflows returns ±Inf like DuckDB") {
    // 1e308 × 10^2 overflows double to +Inf; DuckDB's floor(+Inf)/p is
    // +Inf, so ours must be too (the old guard tested abs(x), not the
    // scaled value, and fell through to pmod(+Inf,1) = NaN).
    assert(rhu(1e308, 2) == Double.PositiveInfinity)
    assert(rhu(-1e308, 2) == Double.NegativeInfinity)
    // the guard must not catch values NEAR the overflow edge that still
    // scale finitely (1e305 × 100 = 1e307, finite)
    assert(!rhu(1e305, 2).isInfinite)
  }

  test("half-up means ties toward +infinity, identically for negatives") {
    assert(rhu(0.125, 2) == 0.13)   // 0.125 is binary-exact: tie, up
    assert(rhu(-0.125, 2) == -0.12) // toward +inf, NOT away from zero
    assert(rhu(2.5, 0) == 3.0)
    assert(rhu(-2.5, 0) == -2.0)
  }

  test("tripwire: no fractional-scale Round in any registered query plan") {
    // The whole suite's oracle parity rests on never using Spark's
    // round() at fractional scale (see roundHalfUp's doc); this walks
    // every registered query's analyzed plan — including lambda bodies,
    // so the scale-0 quantize transform is seen and allowed — and fails
    // the moment anyone reintroduces one.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed
      plan.collectWithSubqueries { case n =>
        n.expressions.flatMap(_.collect { case r: Round => r })
      }.flatten.collect {
        case r if !r.scale.isInstanceOf[Literal] =>
          s"$name: Round with non-literal scale"
        case r if r.scale.asInstanceOf[Literal].value != 0 =>
          s"$name: Round at scale ${r.scale} — use NumFns.roundHalfUp"
      }
    }
    assert(offenders.isEmpty, offenders.distinct.mkString("\n"))
  }

  test("tripwire: no round() in any oracle SQL except the scale-0 quantize") {
    val pat = "round\\(".r
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      val hits = pat.findAllIn(sql.toLowerCase).size
      if (name == "embed_quantize")
        assert(hits == 1 && sql.contains(", 0) AS INT"),
          s"embed_quantize must keep exactly its one scale-0 round, found $hits")
      else assert(hits == 0,
        s"$name reintroduces round() in its oracle twin — spell out " +
          "floor(x * 10^s.0 + 0.5) / 10^s.0 instead (NumFns doc)")
    }
  }

  test("fixpoint and stability across magnitudes") {
    val rnd = new scala.util.Random(20260818L)
    val xs = Seq.fill(200)((rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(7) - 3))
    val once = xs.toDF("x").select(NumFns.roundHalfUp(col("x"), 4).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    val twice = once.toDF("x").select(NumFns.roundHalfUp(col("x"), 4).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(once == twice, "roundHalfUp must be a fixpoint on its own image")
    once.foreach(v => assert(math.abs(v * 10000.0 - math.rint(v * 10000.0)) < 1e-6))
  }
}
