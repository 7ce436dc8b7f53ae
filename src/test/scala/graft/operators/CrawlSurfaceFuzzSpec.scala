package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Generative fuzz for the crawl-surface parsers — the expression-level
  * siblings of the WARC/HTML kernel fuzzes (WarcFuzzSpec, MainContentSpec's
  * tag soup): [[SyncOps.canonicalizeUrls]], [[SyncOps.parseSitemaps]] and
  * [[SyncOps.linkExtract]] all consume remote-controlled strings, and at
  * 100 TB every spelling of a URL and every malformed sitemap WILL occur.
  * Being pure Catalyst expressions they cannot throw, so the properties
  * under test are semantic:
  *
  *  - canonicalization is a FIXPOINT (canonical(canonical(u)) ==
  *    canonical(u)) and collapses a whole equivalence class of spellings
  *    (case, default ports, trailing slashes, param order, fragments) to
  *    one string — the property frontier set-logic (sync_diff,
  *    crawl_frontier, frontier_bloom) silently relies on;
  *  - sitemap extraction recovers planted entries EXACTLY amid junk, and
  *    every surfaced loc is verbatim input substring (nothing invented);
  *  - link extraction resolves each planted anchor class to its
  *    hand-computed absolute URL and drops exactly the droppable classes.
  *
  * Seeded like the sibling fuzzes (reproducible failures). Each test
  * builds ONE DataFrame over all its cases — a few hundred fuzz rows cost
  * one Spark job, not hundreds.
  */
class CrawlSurfaceFuzzSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------ url_canonical

  test("fuzz: url canonicalization collapses every equivalence class to one fixpoint") {
    val rnd = new scala.util.Random(20260815L)
    def twiddleCase(s: String): String =
      s.map(c => if (c.isLetter && rnd.nextBoolean()) c.toUpper else c)

    // A base URL already in canonical form, plus variants that must all
    // collapse back to it.
    case class Cls(canonical: String, variants: Seq[String])
    val classes = (0 until 120).map { i =>
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val host = s"host$i.example.eu"
      val path =
        if (rnd.nextBoolean()) "/"
        else (1 to 1 + rnd.nextInt(3)).map(d => s"seg$d${rnd.nextInt(10)}").mkString("/", "/", "")
      val params = (0 until rnd.nextInt(4)).map(j => s"k${rnd.nextInt(9)}=v$j")
      val query = if (params.isEmpty) "" else params.sorted.mkString("?", "&", "")
      val canonical = s"$scheme://$host$path$query"

      val defaultPort = if (scheme == "http") ":80" else ":443"
      val shuffled = if (params.isEmpty) "" else rnd.shuffle(params).mkString("?", "&", "")
      val frag = rnd.nextInt(4) match {
        case 0 => "#frag"
        case 1 => "#a?x=9" // '?' inside the fragment must never resurrect a query
        case 2 => "#a#b"
        case _ => ""
      }
      val slashes = if (path == "/") "//" else "/" * (1 + rnd.nextInt(3))
      val variants = Seq(
        s"${twiddleCase(scheme)}://${twiddleCase(host)}$path$query",
        s"$scheme://$host$defaultPort$path$query",
        s"$scheme://$host$path$shuffled$frag",
        s"$scheme://$host${if (path == "/") "" else path}$slashes$shuffled",
        s"${twiddleCase(scheme)}://${twiddleCase(host)}$defaultPort$path$slashes$shuffled$frag")
      Cls(canonical, variants)
    }

    val in = classes.zipWithIndex.flatMap { case (c, i) =>
      c.variants.map(v => (i, c.canonical, v))
    }.toDF("cls", "expected", "url")
    val out = SyncOps.canonicalizeUrls(in, "url")
      .select("cls", "expected", "url", "url_canonical").collect()
    assert(out.length == classes.length * 5)
    out.foreach { r =>
      assert(r.getString(3) == r.getString(1),
        s"class ${r.getInt(0)}: ${r.getString(2)} -> ${r.getString(3)}, expected ${r.getString(1)}")
    }

    // Fixpoint: canonicalizing the canonical output changes nothing —
    // checked on the OUTPUT column (covers every variant's image), plus
    // relative/garbage inputs that must pass through untouched.
    val passThrough = Seq("relative/path", "no scheme here", "", "weird#http://x/y",
      "//protocol-relative/left-alone", "?:not-a-scheme")
    val round1 = out.map(_.getString(3)).toSeq ++ passThrough
    val twice = SyncOps.canonicalizeUrls(
      SyncOps.canonicalizeUrls(round1.toDF("url"), "url")
        .select(col("url_canonical").as("url")), "url").collect()
    twice.foreach(r => assert(r.getString(1) == r.getString(0),
      s"not a fixpoint: ${r.getString(0)} -> ${r.getString(1)}"))
    passThrough.foreach { p =>
      assert(twice.exists(_.getString(0) == p), s"pass-through mangled: $p")
    }
  }

  // ------------------------------------------------------------- sitemap_parse

  test("fuzz: sitemap parse recovers planted entries exactly amid junk") {
    val rnd = new scala.util.Random(20260816L)
    // Junk that contains no <url>/</url> tokens: an unclosed <url> opener
    // legitimately swallows up to the NEXT close (non-greedy regex over a
    // broken document — pinned by the directed test below), so the
    // exact-recovery generator keeps junk url-tag-free while still being
    // hostile: stray tags, entities, split brackets, attribute noise.
    def junk(): String = (0 until rnd.nextInt(4)).map(_ => rnd.nextInt(7) match {
      case 0 => "plain text " + rnd.nextInt(1000)
      case 1 => s"<priority>0.${rnd.nextInt(9)}</priority>"
      case 2 => "<changefreq>daily</changefreq>"
      case 3 => "<!-- <urlset> comment trap -->"
      case 4 => "<loc>orphan-loc-no-entry</loc>"
      case 5 => "< url >spaced, does not match</ url >"
      case _ => "&lt;url&gt;entity trap&lt;/url&gt;"
    }).mkString

    case class Doc(id: Int, xml: String, expected: Seq[(String, String)])
    val docs = (0 until 200).map { i =>
      val entries = (0 until rnd.nextInt(6)).map { j =>
        val loc = s"https://s$i.eu/p$j"
        val lastmod = if (rnd.nextBoolean()) s"2026-0${1 + rnd.nextInt(9)}-1$j" else ""
        val lm = if (lastmod.isEmpty) "" else s"<lastmod>$lastmod</lastmod>"
        // lastmod before or after loc — both orders occur in the wild and
        // both extract (the regexes search the whole entry independently)
        val body = if (rnd.nextBoolean()) s"<loc>$loc</loc>$lm" else s"$lm<loc>$loc</loc>"
        (s"<url>$body</url>", (loc, lastmod))
      }
      val xml = "<urlset>" + junk() +
        entries.map(e => e._1 + junk()).mkString + "</urlset>"
      Doc(i, xml, entries.map(_._2))
    }

    val out = SyncOps.parseSitemaps(
        docs.map(d => (d.id, d.xml)).toDF("id", "xml"), "xml")
      .select("id", "url", "lastmod").collect()
      .groupBy(_.getInt(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getString(1), r.getString(2))).toSeq }
    docs.foreach { d =>
      val got = out.getOrElse(d.id, Seq.empty)
      assert(got.sorted == d.expected.sorted,
        s"doc ${d.id}: got $got expected ${d.expected}\nxml=${d.xml}")
      // nothing invented: every surfaced loc is a verbatim input substring
      got.foreach { case (loc, _) => assert(d.xml.contains(s"<loc>$loc</loc>")) }
    }
  }

  test("sitemap parse: truncated tail entry drops; unclosed opener swallows to next close") {
    // A tail <url> with no close never surfaces — truncation loses at most
    // the torn entry, matching the WARC kernels' prefix-of-truth stance.
    val truncated = "<urlset><url><loc>https://a.eu/ok</loc></url><url><loc>https://a.eu/torn"
    val r1 = SyncOps.parseSitemaps(Seq((1, truncated)).toDF("id", "xml"), "xml")
      .select("url").as[String].collect().toSeq
    assert(r1 == Seq("https://a.eu/ok"))

    // An unclosed opener mid-document swallows up to the NEXT </url>: the
    // merged region surfaces ONE row whose loc is the first <loc> inside
    // it (the broken entry's), and the swallowed entry is lost. This is
    // the documented cost of regex-tier parsing on a broken document —
    // bounded (one entry per unclosed opener), never a throw/hang.
    val unclosed = "<urlset><url><loc>https://a.eu/broken</loc>" +
      "<url><loc>https://a.eu/swallowed</loc></url>" +
      "<url><loc>https://a.eu/after</loc></url></urlset>"
    val r2 = SyncOps.parseSitemaps(Seq((1, unclosed)).toDF("id", "xml"), "xml")
      .select("url").as[String].collect().toSeq
    assert(r2 == Seq("https://a.eu/broken", "https://a.eu/after"))
  }

  // -------------------------------------------------------------- link_extract

  test("fuzz: link extraction resolves planted anchor classes exactly") {
    val rnd = new scala.util.Random(20260817L)
    val pageUrl = "https://site.eu/sec/page.html"
    val host = "https://site.eu"
    val dir = "https://site.eu/sec/"

    // (href to plant, expected resolved url or None-to-drop); attribute
    // junk and case vary per instance. Junk anchors are single-quoted or
    // href-less — by the kernel's contract only double-quoted hrefs match
    // (an unclosed double-quoted <a> swallows to the next </a>, same
    // regex-tier cost the sitemap test pins, so the generator closes every
    // planted anchor).
    def planted(i: Int): (String, Option[String]) = rnd.nextInt(8) match {
      case 0 => (s"https://ext.eu/abs$i", Some(s"https://ext.eu/abs$i"))
      case 1 => (s"HTTPS://ext.eu/ABS$i", Some(s"HTTPS://ext.eu/ABS$i"))
      case 2 => (s"//cdn.eu/pr$i", Some(s"https://cdn.eu/pr$i"))
      case 3 => (s"/root$i", Some(s"$host/root$i"))
      case 4 => (s"rel$i/x", Some(s"${dir}rel$i/x"))
      case 5 => (s"#frag$i", None)
      case 6 => (s"JavaScript:void($i)", None)
      case _ => (s"mailto:x$i@eu.eu", None)
    }
    def anchorTag(href: String, text: String): String = {
      val attrs = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => " class=\"c\" data-x=\"1\""
        case _ => " TARGET=\"_blank\""
      }
      val a = if (rnd.nextBoolean()) "a" else "A"
      s"<$a${attrs.take(if (rnd.nextBoolean()) attrs.length else 0)} href=\"$href\"$attrs>$text</$a>"
    }
    def junkHtml(): String = rnd.nextInt(5) match {
      case 0 => "<p>prose " + rnd.nextInt(100) + "</p>"
      case 1 => "<a href='single-quoted-ignored'>j</a>"
      case 2 => "<a name=\"no-href\">j</a>"
      case 3 => "<div class=\"href=\">attr trap</div>"
      case _ => "text with href=\"not-in-a-tag\" bare"
    }

    case class Doc(id: Int, html: String, expected: Seq[(String, String)])
    val docs = (0 until 150).map { i =>
      val anchors = (0 until rnd.nextInt(5)).map { j =>
        val (href, resolved) = planted(i * 10 + j)
        val text = s"t${i}_$j"
        (anchorTag(href, s"<b>$text</b> tail"), resolved.map(u => (u, s"$text tail")))
      }
      val html = junkHtml() + anchors.map(a => a._1 + junkHtml()).mkString
      Doc(i, html, anchors.flatMap(_._2))
    }

    val out = SyncOps.linkExtract(
        docs.map(d => (d.id, d.html, pageUrl)).toDF("id", "html", "page_url"),
        "html", "page_url")
      .select("id", "link_url", "anchor").collect()
      .groupBy(_.getInt(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getString(1), r.getString(2))).toSeq }
    docs.foreach { d =>
      val got = out.getOrElse(d.id, Seq.empty)
      assert(got.sorted == d.expected.sorted,
        s"doc ${d.id}: got $got expected ${d.expected}\nhtml=${d.html}")
    }
  }
}
