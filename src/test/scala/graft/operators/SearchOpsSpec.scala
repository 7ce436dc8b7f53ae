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
}
