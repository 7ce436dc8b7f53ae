package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MainContainer / PruneChrome + the composed mainTextBlocks extraction —
  * the trafilatura-class path (trafilatura_extract.py:9-56 patched
  * BODY_XPATH selection, :120-122 favor_recall extract). Fixture pages
  * under src/test/resources/maincontent are realistic page shapes with
  * hand-derived expected main text; unit cases cover the tier priority
  * and the attribute case-folds a regex could not express.
  */
class MainContentSpec extends SparkSpec {

  private def extract(html: String): String =
    spark.range(1)
      .select(graft.operators.NormOps.mainTextBlocks(lit(html)).as("r"))
      .head.getString(0)

  private def container(html: String): String =
    spark.range(1).select(TextFns.mainContainer(lit(html)).as("r"))
      .head.getString(0)

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/maincontent/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  // ---- fixture parity: realistic pages, hand-derived expected text ------
  for (i <- 1 to 7) {
    test(s"fixture page$i extracts exactly the expected main text") {
      val got = extract(fixture(s"page$i.html"))
      assert(got == fixture(s"page$i.txt").trim,
        s"page$i main text mismatch:\n---got---\n$got\n---")
    }
  }

  // ---- tier priority ----------------------------------------------------
  test("a later tier-1 container beats an earlier article element") {
    val html = "<article><p>Teaser text of the listing page, long enough to pass.</p></article>" +
      "<div class=\"post-content\"><p>The story body wins because its tier is lower.</p></div>"
    assert(extract(html) == "The story body wins because its tier is lower.")
  }

  test("first match in document order wins within a tier") {
    val html = "<div id=\"content\"><p>First tier-four container in the document order.</p></div>" +
      "<div class=\"content-area\"><p>Second tier-four container never gets selected.</p></div>"
    assert(extract(html) == "First tier-four container in the document order.")
  }

  test("the XPath translate() case-folds: articlebody id, FULLTEXT class, Main-Content id") {
    val a = "<div id=\"x-articleBody\"><p>Selected through the translated id test.</p></div>"
    assert(extract(a) == "Selected through the translated id test.")
    val b = "<section class=\"FullText\"><p>Selected through the FULTEX translation.</p></section>" +
      "<div><p>Sibling text outside the container stays out of the result.</p></div>"
    assert(extract(b) == "Selected through the FULTEX translation.")
    val c = "<div id=\"Main-Content\"><p>Selected through the CM translation of the id.</p></div>"
    assert(extract(c) == "Selected through the CM translation of the id.")
  }

  test("class equality vs contains: class='post' matches, class='posting' does not") {
    val hit = "<div class=\"post\"><p>Equality-matched container text, long enough to keep.</p></div>"
    assert(extract(hit) == "Equality-matched container text, long enough to keep.")
    val miss = "<div class=\"posting\"><p>No container here, so whole-page extraction applies.</p></div>" +
      "<footer><p>Footer chrome is pruned either way by the noise list.</p></footer>"
    assert(extract(miss) == "No container here, so whole-page extraction applies.")
  }

  test("candidates inside chrome do not win (nav'd article is not the body)") {
    val html = "<nav><article><p>A teaser card inside the navigation chrome of the page.</p></article></nav>" +
      "<main><p>The real main element carries the page content to extract.</p></main>"
    assert(extract(html) == "The real main element carries the page content to extract.")
  }

  // ---- container slicing / pruning mechanics ---------------------------
  test("same-name nesting: the container's own close tag ends it, not an inner div's") {
    val html = "<div class=\"article-content\"><div><p>Nested block stays inside the container.</p></div></div>" +
      "<div><p>A sibling div after the container must not be included at all.</p></div>"
    assert(extract(html) == "Nested block stays inside the container.")
  }

  test("an unclosed container runs to end of input instead of throwing") {
    val html = "<div class=\"article-content\"><p>Content of a container nobody closed properly.</p>" +
      "<p>It keeps collecting until the document simply ends here.</p>"
    assert(extract(html) ==
      "Content of a container nobody closed properly.\nIt keeps collecting until the document simply ends here.")
  }

  test("pruneChrome drops chrome subtrees and comments, keeps content") {
    val got = spark.range(1).select(TextFns.pruneChrome(lit(
      "<head><title>T</title></head><p>keep</p><!-- note --><footer>legal</footer><em>tail</em>"))
      .as("r")).head.getString(0)
    assert(got == "<p>keep</p><em>tail</em>")
  }

  test("null html stays null; empty html extracts empty") {
    val r = spark.sql("SELECT 1").select(
      graft.operators.NormOps.mainTextBlocks(lit(null).cast("string")).as("a"),
      graft.operators.NormOps.mainTextBlocks(lit("")).as("b")).head
    assert(r.isNullAt(0) && r.getString(1) == "")
  }

  test("selectMain narrows to the first matching element; not found = empty string") {
    def sel(html: String, selector: String): String =
      spark.range(1).select(TextFns.selectMain(lit(html), selector).as("r"))
        .head.getString(0)
    val html = """<div class="a"><p>first</p><div>nested</div></div>""" +
      """<div class="a"><p>second</p></div><div id="m">by id</div>"""
    assert(sel(html, ".a") == "<p>first</p><div>nested</div>",
      "first match wins, same-name nesting respected")
    assert(sel(html, "#m") == "by id")
    assert(sel(html, ".missing") == "",
      "the reference returns '' when main_by_css_selector matches nothing")
    assert(sel("""<script>var a = '<div class="a">x</div>';</script>""", ".a") == "",
      "selector text inside script raw text never matches")
  }

  test("nlpPreprocess mainSelector narrows before extraction; miss falls back to fields") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((
      "<div class=\"col-left\"><p>Narrowed prose selected by the configured main selector.</p></div>" +
        "<p>Outside prose that the narrowing must exclude from the page text.</p>",
      "T", "")).toDF("web_html", "title", "pdf_text")
    val got = graft.operators.NormOps.nlpPreprocess(docs,
      mainSelector = Some(".col-left")).select("nlp_text").head.getString(0)
    assert(got == "Narrowed prose selected by the configured main selector.\n\n")
    val missed = graft.operators.NormOps.nlpPreprocess(docs,
      mainSelector = Some(".no-such")).select("nlp_text").head.getString(0)
    assert(missed == "\n\nT.\n\n\n\n",
      "selector miss = empty extraction = the field-assembly fallback")
  }

  // ---- element-level link-density pruning (delete_by_link_density) ------
  test("an in-container link farm drops WHOLE, including its prose-shaped line") {
    // trafilatura's element-level link density: the farm's one low-density
    // prose line must NOT survive on its own merits — the line filter alone
    // would keep it (that was the pinned divergence; now closed).
    val html = "<div class=\"article-content\"><p>Prose paragraph that carries the actual document content.</p>" +
      "<div class=\"related\"><ul>" +
      "<li><a href=\"/a\">First related link with a prose-length anchor text inside</a></li>" +
      "<li><a href=\"/b\">Second related link, equally long anchor text in the list</a></li>" +
      "</ul><p>Browse every publication in the <a href=\"/c\">catalogue</a> today.</p></div>" +
      "<p>Closing paragraph of the article body with enough length to keep.</p></div>"
    assert(extract(html) ==
      "Prose paragraph that carries the actual document content.\n" +
        "Closing paragraph of the article body with enough length to keep.")
  }

  test("a block under the density threshold keeps all its lines") {
    val html = "<div class=\"article-content\"><div class=\"note\">" +
      "<p>A mostly-prose note that merely cites the <a href=\"/src\">source</a> of the figures.</p>" +
      "</div></div>"
    assert(extract(html) ==
      "A mostly-prose note that merely cites the source of the figures.")
  }

  test("a farm nested inside a kept block drops without taking the prose") {
    val html = "<div class=\"article-content\"><div class=\"body\">" +
      "<p>Outer prose stays because the outer block is mostly regular text, not links, " +
        "and it keeps going long enough to dominate the density ratio of its subtree.</p>" +
      "<ul><li><a href=\"/x\">Pure link item number one of the nested farm</a></li>" +
      "<li><a href=\"/y\">Pure link item number two of the nested farm</a></li></ul>" +
      "</div></div>"
    assert(extract(html) ==
      "Outer prose stays because the outer block is mostly regular text, not links, " +
        "and it keeps going long enough to dominate the density ratio of its subtree.")
  }

  test("the whole-page fallback path prunes link farms too") {
    // no tier matches -> pruneChrome fallback; the farm drops there as well
    val html = "<p>Standalone prose page without any recognized container element.</p>" +
      "<div class=\"tags\"><a href=\"/t/1\">air pollution</a> <a href=\"/t/2\">water quality</a> " +
      "<a href=\"/t/3\">biodiversity loss</a> <a href=\"/t/4\">climate adaptation</a></div>"
    assert(extract(html) ==
      "Standalone prose page without any recognized container element.")
  }

  test("an unclosed link-heavy element does not swallow the rest of the document") {
    // A never-closed <ul> would claim everything to end-of-input as its
    // subtree; lxml auto-closes at the parent boundary and keeps the
    // trailing prose. The drop decision therefore requires a REAL close
    // tag — the unclosed farm's own link lines still die in the line
    // filter, but the paragraph after it must survive.
    val html = "<div class=\"article-content\"><ul>" +
      "<li><a href=\"/a\">First navigation link with deliberately long anchor text</a></li>" +
      "<li><a href=\"/b\">Second navigation link with deliberately long anchor text</a></li>" +
      "<p>Trailing prose paragraph that must survive the malformed list above it.</p></div>"
    assert(extract(html) ==
      "Trailing prose paragraph that must survive the malformed list above it.")
  }

  test("a stray unclosed <a> does not poison trailing text as link text") {
    // lxml (trafilatura's parser) implicitly closes an open <a> when the
    // next <a> starts. The density scan mirrors that (depth pinned at 1 on
    // a nested open): without it, one malformed anchor would leave
    // anchorDepth > 0 after the next pair's </a> and count every trailing
    // plain char as link text, flipping a mostly-prose block into a "farm".
    val html = "<div class=\"article-content\"><div class=\"body\">" +
      "<a href=\"/m\">menu" + // never closed — implicit close at next <a>
      "<a href=\"/n\">next</a> " +
      "<p>This trailing prose is plain text, long enough that the block's " +
      "true link density sits far below the farm threshold, and it must " +
      "survive the malformed anchor pair that precedes it in the block.</p>" +
      "</div></div>"
    val got = extract(html)
    assert(got.contains("This trailing prose is plain text"),
      s"prose over-dropped after stray unclosed <a>: '$got'")
  }

  test("hostile deep div nesting stays linear (depth cap bounds the farm scans)") {
    // 20k nested divs: without the FarmDepthCap each candidate would scan
    // its whole subtree → O(n·depth) ≈ 3e9 char ops (tens of seconds);
    // with the cap the pass is O(n·cap) and finishes in milliseconds.
    val depth = 20000
    val sb = new StringBuilder("<div class=\"article-content\">")
    var d = 0
    while (d < depth) { sb.append("<div>x "); d += 1 }
    sb.append("A single prose sentence buried at the bottom of the hostile nesting pit.")
    d = 0
    while (d < depth) { sb.append("</div>"); d += 1 }
    sb.append("</div>")
    val t0 = System.nanoTime()
    val got = extract(sb.toString)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.contains("hostile nesting pit"), "content survives the clamp")
    assert(secs < 10.0, f"hostile nesting must not stall the task (took $secs%.1f s)")
  }

  test("fuzz: hostile tag soup never throws any kernel") {
    // Seeded (reproducible) fuzz over adversarial fragment soup: unclosed
    // tags, stray '<', unbalanced farm tags, anchors, raw-text islands,
    // half-open comments, quotes. A crawl archive contains every
    // malformation the web has — the kernels may extract imperfect text
    // from garbage, but they must never throw or hang on it.
    val frags = Array(
      "<div>", "</div>", "<ul>", "</ul>", "<li>", "</li>", "<table>",
      "</table>", "<a href=\"/x\">", "</a>", "<a>", "<div class=\"post\">",
      "<article>", "</article>", "<main>", "</main>", "<script>",
      "</script>", "<script>var a='<div>';</script>", "<!-- c -->",
      "<!--", "-->", "<br/>", "<img src=x>", "< ", "<", ">", "</", "/>",
      "text and more text. ", "linky ", "x", "\"", "'", "<div", "</x1>",
      "<nav>", "</nav>", "<p>", "</p>", "prose sentence that runs long enough to keep. ")
    val rnd = new scala.util.Random(20260813L)
    var t = 0
    while (t < 400) {
      val n = 1 + rnd.nextInt(60)
      val sb = new StringBuilder
      var j = 0
      while (j < n) { sb.append(frags(rnd.nextInt(frags.length))); j += 1 }
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      assert(MainContainer.select(u) != null)   // must not throw
      assert(MainContainer.pruneAll(u) != null) // must not throw
      t += 1
    }
  }

  test("fuzz: the farm pass is idempotent on balanced markup") {
    // On BALANCED markup the drop is provably stable: a kept block with
    // link share L/T <= 0.5 containing a dropped farm (l/t > 0.5) keeps
    // (L-l)/(T-t) < 0.5 after the drop, so a second pass changes nothing.
    // (On tag SOUP idempotence is unattainable at the text level —
    // removing a chunk re-pairs the remaining unbalanced close tags;
    // trafilatura sidesteps that only because lxml builds a normalized
    // DOM first. The no-throw fuzz above covers soup.) This generator
    // builds random balanced trees: nested elements, anchors, raw-text
    // islands, comments, void tags, text.
    val rnd = new scala.util.Random(20260814L)
    val tags = Array("div", "ul", "li", "p", "section", "table", "span")
    val texts = Array("plain words here ", "x ", "a longer prose run that keeps going. ",
      "link label ", "short")
    def build(depth: Int, budget: Int): String = {
      val sb = new StringBuilder
      val items = 1 + rnd.nextInt(4)
      var i = 0
      while (i < items && sb.length < budget) {
        rnd.nextInt(8) match {
          case 0 | 1 => sb.append(texts(rnd.nextInt(texts.length)))
          case 2 => sb.append("<a href=\"/l").append(rnd.nextInt(9))
            .append("\">").append(texts(rnd.nextInt(texts.length))).append("</a>")
          case 3 => sb.append("<!-- note -->")
          case 4 => sb.append(if (rnd.nextBoolean()) "<br/>" else "<img src=x>")
          case 5 => sb.append("<script>var soup='<div><a href=x>';</script>")
          case _ if depth > 0 =>
            val t = tags(rnd.nextInt(tags.length))
            sb.append('<').append(t).append('>')
              .append(build(depth - 1, budget - sb.length))
              .append("</").append(t).append('>')
          case _ => sb.append(texts(rnd.nextInt(texts.length)))
        }
        i += 1
      }
      sb.toString
    }
    var t = 0
    while (t < 300) {
      val html = build(4, 4000)
      val once = MainContainer.dropLinkFarms(html)
      val twice = MainContainer.dropLinkFarms(once)
      assert(twice == once,
        s"farm pass not idempotent on balanced tree[$t]:\n$html\n--once--\n$once\n--twice--\n$twice")
      t += 1
    }
  }

  test("codegen and interpreted kernels agree bit for bit") {
    val html = fixture("page1.html")
    val viaExpr = container(html)
    val direct = MainContainer.select(
      org.apache.spark.unsafe.types.UTF8String.fromString(html)).toString
    assert(viaExpr == direct)
  }
}
