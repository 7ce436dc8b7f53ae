package graft.functions

import graft.SparkSpec
import graft.functions.TextFns.stripSelectors
import org.apache.spark.sql.functions._

/** StripHtmlSelectors — the remove_by_selector kernel
  * (trafilatura_extract.py:96-109). The cases a regex replacement cannot
  * express (same-name nesting) are the reason the kernel exists.
  */
class HtmlExpressionsSpec extends SparkSpec {

  private def strip(html: String, sels: Seq[String]): String =
    spark.range(1).select(stripSelectors(lit(html), sels).as("r"))
      .head.getString(0)

  test("removes by id and by class token, keeping surrounding text") {
    val html = """<body><nav id="portal-globalnav"><a>Home</a></nav>""" +
      """<p>keep me</p><div class="eea footer x">gone</div>tail</body>"""
    assert(strip(html, Seq("#portal-globalnav", ".footer")) ==
      "<body><p>keep me</p>tail</body>")
  }

  test("class compound .a.b requires BOTH tokens") {
    val html = """<div class="eea">k1</div><div class="banner">k2</div>""" +
      """<div class="eea banner">gone</div>"""
    assert(strip(html, Seq(".eea.banner")) ==
      """<div class="eea">k1</div><div class="banner">k2</div>""")
  }

  test("same-name nesting drops the whole subtree (the non-regex case)") {
    val html = """<div class="footer"><div>inner</div><span>x</span></div>after"""
    assert(strip(html, Seq(".footer")) == "after")
    // the regex form would stop at the first </div> and leak '<span>x</span></div>'
  }

  test("matched void/self-closing elements drop without eating siblings") {
    assert(strip("""<img class="footer" src="x"/><p>keep</p>""", Seq(".footer")) ==
      "<p>keep</p>")
    assert(strip("""<br class="footer"><p>keep</p>""", Seq(".footer")) ==
      "<p>keep</p>")
  }

  test("unmatched html passes through byte-identical") {
    val html = """<div class="content"><!-- note --><p id="a">text</p></div>"""
    assert(strip(html, Seq("#nope", ".missing")) == html)
  }

  test("a commented-out close tag inside a removed subtree does not count") {
    val html = """<div class="footer">x<!-- </div> -->y</div>keep"""
    assert(strip(html, Seq(".footer")) == "keep")
  }

  test("a matched element never closed drops the remainder") {
    assert(strip("""pre<div class="footer"><p>lost""", Seq(".footer")) == "pre")
  }

  test("a literal </div> inside a script string does not end a removed subtree") {
    val html = """<div class="footer">x<script>var s = "</div>";</script>y</div>keep"""
    assert(strip(html, Seq(".footer")) == "keep")
  }

  test("a literal <div inside script raw text is not selector-matched") {
    val html = """<script>var t = '<div class="footer">';</script><p>keep</p>"""
    assert(strip(html, Seq(".footer")) == html)
  }

  test("a matched script element removes exactly its raw-text span") {
    val html = """<script class="footer">if (a<b) { x = "</p>"; }</script><p>keep</p>"""
    assert(strip(html, Seq(".footer")) == "<p>keep</p>")
    // style too, and a longer name must not alias the close scan
    val css = """<style class="footer">.a{}</styles></style><i>k</i>"""
    assert(strip(css, Seq(".footer")) == "<i>k</i>")
  }

  test("an unclosed script inside a removed subtree drops the remainder") {
    assert(strip("""pre<div class="footer"><script>x""", Seq(".footer")) == "pre")
  }

  test("single-quoted and unquoted attribute values match") {
    assert(strip("""<div class='footer'>g</div>k""", Seq(".footer")) == "k")
    assert(strip("""<div id=nav>g</div>k""", Seq("#nav")) == "k")
  }

  test("unsupported selector grammar is rejected at plan time") {
    for (bad <- Seq("div > .x", "p", ".banner#main", ".", "#"))
      intercept[IllegalArgumentException] {
        StripHtmlSelectors.parse(Seq(bad))
      }
  }

  test("stripSelectors stays inside whole-stage codegen") {
    // the reference-object type must render in Java source syntax — a JVM
    // binary array name fails janino and silently drops to eval. With
    // fallback disabled a compile failure throws instead of degrading.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(4).select(
        stripSelectors(concat(lit("<div class=\"x\">g</div>k"), col("id")),
          Seq(".x")).as("r"))
      assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
        "expected a whole-stage-codegen'd (*) projection")
      assert(df.collect().map(_.getString(0)).toSeq ==
        (0 until 4).map(i => s"k$i"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("codegen and interpreted paths agree on a mixed document") {
    val html = """<html><nav id="n"><a>x</a></nav><div class="a b">""" +
      """<div>deep</div></div><p>body</p><img class="a" src="s"></html>"""
    val df = spark.range(64).select(
      concat(lit(html), lit("<i>"), col("id"), lit("</i>")).as("h"))
    val viaCodegen = df.select(stripSelectors(col("h"), Seq("#n", ".a")).as("r"))
      .collect().map(_.getString(0))
    val expected = (0 until 64).map(i => s"<html><p>body</p></html><i>$i</i>")
    assert(viaCodegen.toSeq == expected)
    // interpreted path (eval): direct kernel call
    val parsed = StripHtmlSelectors.parse(Seq("#n", ".a"))
    val viaEval = (0 until 64).map(i => StripHtmlSelectors.strip(
      org.apache.spark.unsafe.types.UTF8String.fromString(html + s"<i>$i</i>"),
      parsed).toString)
    assert(viaEval == expected)
  }

  test("nlpPreprocess applies removeSelectors before extraction") {
    val docs = spark.range(1).selectExpr(
      """'<html><body><nav class="main-menu"><a>A very long navigation line that would otherwise pass the length rule.</a></nav><p>the real body prose which is long enough to survive</p></body></html>' as web_html""",
      "'T' as title", "'' as pdf_text")
    val out = graft.operators.NormOps.nlpPreprocess(docs,
        removeSelectors = Seq(".main-menu"))
      .select("nlp_text").head.getString(0)
    assert(out.contains("the real body prose"))
    assert(!out.contains("navigation line"))
  }

  test("script is never self-closing: <script/> raw text runs to </script>") {
    // per the HTML spec a browser treats <script .../> as an OPEN tag —
    // the literal </div> inside the JS string must stay opaque
    val html = "<div class=\"footer\"><script src=\"a\"/>var s = \"</div>\";</script>x</div>keep"
    val out = strip(html, Seq(".footer"))
    assert(out == "keep", s"got '$out'")
  }

  test("unquoted attribute values keep '/' (HTML5): class=foo/bar is one token") {
    // a '/'-bearing unquoted value must NOT truncate to 'foo' and
    // false-match the .foo selector
    val html = "<div class=foo/bar>gone?</div>keep"
    assert(strip(html, Seq(".foo")) == "<div class=foo/bar>gone?</div>keep",
      "selector .foo must not match token foo/bar")
    // while the real token still matches
    assert(strip("<div class=foo>x</div>keep", Seq(".foo")) == "keep")
  }
}
