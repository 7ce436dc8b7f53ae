package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchOpsSpec extends SparkSpec {

  test("BM25 ranks a rare discriminative term above a ubiquitous one") {
    val spark2 = spark
    import spark2.implicits._
    // 20 docs all contain "common"; only doc 1 contains "rare". Under the
    // old TF×(1/len) scorer both docs score the same for their term; under
    // BM25 the rare term's idf dominates.
    val docs = (1 to 20).map { i =>
      val text = if (i == 1) "rare common filler words here" else "common filler words here pad"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val top = SearchOps.matchBm25TopK(docs, "text", Seq("rare", "common"), k = 20)
      .select("doc_id", "score").collect()
    assert(top.head.getLong(0) === 1L, "doc with the rare term must rank first")
    val first = top.head.getDouble(1)
    val second = top(1).getDouble(1)
    assert(first > second * 2,
      s"rare-term doc ($first) should dominate common-only docs ($second)")
  }

  test("multiMatchTopK: a boosted title hit outranks an equal body hit") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "climate report", "some unrelated body words here today"),
      (2L, "something else", "climate appears in the body words here"),
      (3L, "nothing here", "no match at all in this document")
    ).toDF("doc_id", "title", "body")
    val got = SearchOps.multiMatchTopK(docs,
      fields = Seq("title" -> 3.0, "body" -> 1.0),
      terms = Seq("climate"), k = 10)
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 2L), "title^3 hit first, body hit second, no-match dropped")
  }

  test("phraseTopK matches only consecutive token runs, never bags of words") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "the data pipeline processes the data quickly"), // 2 runs
      (2L, "data comes first and the rest follows"),        // both words, wrong order
      (3L, "the big data system")                           // not consecutive
    ).toDF("doc_id", "text")
    val got = SearchOps.phraseTopK(docs, "text", Seq("the", "data"), k = 10)
      .select("doc_id", "phrase_tf").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)), "only the consecutive-run doc matches")
  }

  test("BM25 of a term present in every doc is near zero but still positive") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1 to 10).map(i => (i.toLong, "same text every doc")).toDF("doc_id", "text")
    val got = SearchOps.matchBm25TopK(docs, "text", Seq("same"), k = 10).collect()
    assert(got.length === 10)
    // idf = ln(1 + 0.5/10.5) ≈ 0.0465 — small, not zero (Lucene's +1 inside
    // the log keeps idf positive so matching docs always outrank non-matches).
    assert(got.forall(r => r.getAs[Double]("score") > 0 && r.getAs[Double]("score") < 0.1))
  }

  test("facetStatsApprox tracks the exact percentiles within sketch error") {
    val docs = graft.Tables.documents(spark, sfDir)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val exact = asMap(SearchOps.facetStats(docs, "lang", "n_chars"))

    // default accuracy (10000) is exact for facet-sized groups
    val hi = asMap(SearchOps.facetStatsApprox(docs, "lang", "n_chars"))
    // approx_percentile returns an actual element, percentile interpolates:
    // allow one rank step of slack even at full accuracy
    exact.foreach { case (lang, (p50, p95)) =>
      assert(math.abs(hi(lang)._1 - p50) / p50 < 0.05, s"$lang p50 hi-acc")
      assert(math.abs(hi(lang)._2 - p95) / p95 < 0.05, s"$lang p95 hi-acc")
    }

    // a deliberately coarse sketch stays within ~10% relative error —
    // the scale trade documented on facetStatsApprox
    val lo = asMap(SearchOps.facetStatsApprox(docs, "lang", "n_chars", accuracy = 50))
    exact.foreach { case (lang, (p50, p95)) =>
      assert(math.abs(lo(lang)._1 - p50) / p50 < 0.10, s"$lang p50 lo-acc")
      assert(math.abs(lo(lang)._2 - p95) / p95 < 0.10, s"$lang p95 lo-acc")
    }
  }

  test("facetStatsApprox at a p95 cliff: the accuracy knob boundary is rank-exact") {
    val spark2 = spark
    import spark2.implicits._
    // adversarial distribution for a rank sketch: 950 values of 10, then a
    // six-order-of-magnitude cliff (50 values of 1e6) sitting EXACTLY at
    // the 95th percentile rank — a one-rank sketch error flips the answer
    // by 10^5. GK error is <= n/accuracy ranks, so accuracy=10n is
    // rank-exact and must return the element at rank floor(0.95*(n-1))+1
    // = 950, i.e. 10 — never the far side, never an interpolation.
    val docs = ((1 to 950).map(i => (i.toLong, 10L)) ++
      (951 to 1000).map(i => (i.toLong, 1000000L)))
      .toDF("id", "value").withColumn("facet", lit("c")).repartition(7)
    val sharp = SearchOps.facetStatsApprox(docs, "facet", "value", accuracy = 10000)
      .head
    assert(sharp.getAs[Double]("p50") == 10.0)
    assert(sharp.getAs[Double]("p95") == 10.0,
      "rank-exact sketch resolves the cliff to the true rank-950 element")
    // at a deliberately coarse knob the sketch may land on either side of
    // the cliff, but the element-of-input property must hold — a rank
    // sketch can be off by ranks, it can never invent a value
    val coarse = SearchOps.facetStatsApprox(docs, "facet", "value", accuracy = 20)
      .head.getAs[Double]("p95")
    assert(coarse == 10.0 || coarse == 1000000.0,
      s"sketch answers are input elements even at the knob floor, got $coarse")
  }

  test("facetStatsApproxBounds: rank windows are integer-exact and the contract holds") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val rows = SearchOps.facetStatsApproxBounds(docs, "lang", "n_chars").collect()
    assert(rows.nonEmpty)
    // the contract column the oracle twin asserts all-true
    assert(rows.forall(_.getAs[Boolean]("within_bounds")),
      "every approx value's exact rank interval intersects the guaranteed window")
    // window arithmetic (floor/ceil targets ± ceil(eps*m), clamped) is the
    // documented integer form — recompute it here independently
    rows.foreach { r =>
      val m = r.getAs[Long]("m")
      val e = (m + 9999) / 10000
      assert(r.getAs[Long]("lo50") == math.max(1L, m / 2 - e))
      assert(r.getAs[Long]("hi50") == math.min(m, (m + 1) / 2 + e))
      assert(r.getAs[Long]("lo95") == math.max(1L, 19 * m / 20 - e))
      assert(r.getAs[Long]("hi95") == math.min(m, (19 * m + 19) / 20 + e))
    }
    // the check has teeth: at the p95 cliff (950×10 then 50×1e6) with a
    // coarse-but-guaranteed knob, the sketch may land on EITHER side of the
    // cliff yet must stay inside its widened rank window — and a value that
    // broke the guarantee (rank error > eps*m) would flip within_bounds
    val cliff = ((1 to 950).map(i => (i.toLong, 10L)) ++
      (951 to 1000).map(i => (i.toLong, 1000000L)))
      .toDF("id", "value").withColumn("facet", lit("c")).repartition(7)
    val b = SearchOps.facetStatsApproxBounds(cliff, "facet", "value", accuracy = 20)
      .head
    assert(b.getAs[Long]("m") == 1000L)
    assert(b.getAs[Boolean]("within_bounds"),
      "GK guarantee holds even at the adversarial cliff at the knob floor")
  }
}
