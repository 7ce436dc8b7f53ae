package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanHtml strips tags like the reference regex and trims") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "  <br/>spaced  "),
      (3L, "<a href=\"x\">link</a> tail"),
      (4L, "<only><tags/>")).toDF("doc_id", "html")
    val got = NormOps.cleanHtmlDocs(df, "html").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 4 collapses to empty and is removed (remove_empty semantics)
    assert(got.toSeq === Seq((1L, "hello world"), (2L, "spaced"), (3L, "link tail")))
  }

  test("readingTime matches words/228 and the blacklist yields -1") {
    val df = Seq((1L, "one two three", false), (2L, "one two three", true))
      .toDF("doc_id", "text", "black")
    val got = NormOps.addReadingTime(df, "text", col("black"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_words") === 3L)
    assert(math.abs(got(0).getAs[Double]("reading_time") - 0.0132) <= 1e-9)
    assert(got(1).getAs[Double]("reading_time") === -1.0)
  }

  test("textPassages produces overlapping fixed windows covering every word") {
    val text = (1 to 130).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = NormOps.textPassages(df, "text", splitLength = 60, overlap = 15)
      .orderBy("passage_id").collect()
    // stride 45: starts at 0, 45, 90 -> 3 passages; last has 130-90=40 words
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("n_words")).toSeq === Seq(60L, 60L, 40L))
    assert(rows(1).getAs[String]("passage").startsWith("w46 "))
    // overlap: passage 0 ends at w60, passage 1 starts at w46
    assert(rows(0).getAs[String]("passage").endsWith(" w60"))
  }

  test("sentencePassages respects sentence boundaries within the word budget") {
    val text = "One two three four. Five six seven! Eight nine ten eleven twelve? Thirteen."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = NormOps.sentencePassages(df, "text", splitLength = 8)
      .orderBy("passage_id").collect()
    // greedy packing: [4w + 3w = 7w], [5w + 1w = 6w]
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("passage") === "One two three four. Five six seven!")
    assert(rows(0).getAs[Int]("n_words") === 7)
    assert(rows(1).getAs[String]("passage") === "Eight nine ten eleven twelve? Thirteen.")
    // no passage exceeds the budget; no sentence is split across passages
    assert(rows.forall(_.getAs[Int]("n_words") <= 8))
  }

  test("sentencePassages keeps an oversized single sentence whole") {
    val long = (1 to 20).map(i => s"w$i").mkString(" ") + "."
    val df = Seq((1L, s"Short one. $long Tail two.")).toDF("doc_id", "text")
    val rows = NormOps.sentencePassages(df, "text", splitLength = 8)
      .orderBy("passage_id").collect()
    assert(rows.length === 3)
    assert(rows(1).getAs[Int]("n_words") === 20) // not split mid-sentence
  }

  test("flattenStructs turns nested structs into dotted-key columns") {
    val json = """{"a": {"b": {"c": 1}, "d": "x"}, "e": 2}"""
    val df = Seq(json).toDF("j")
      .select(from_json(col("j"), schema_of_json(json)).as("root"))
      .select("root.*")
    val flat = NormOps.flattenStructs(df)
    assert(flat.columns.toSeq === Seq("a.b.c", "a.d", "e"))
    val r = flat.collect()(0)
    assert(r.getLong(0) === 1L && r.getString(1) === "x" && r.getLong(2) === 2L)
  }
}
