package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native subtree removal by simple CSS selector — the
  * `remove_by_selector` half of the reference's trafilatura wrapper
  * (normalizers/lib/trafilatura_extract.py:96-109: per-site configs list
  * selectors whose matched elements are removed from the DOM before text
  * extraction). Every selector the reference's variables.json actually
  * ships is a SIMPLE selector — `#id`, `.class`, or a class compound like
  * `.eea.banner` — so that grammar is supported exactly and anything else
  * is rejected at plan time.
  *
  * Removal is true SUBTREE removal, which a regex cannot express: the
  * kernel scans the html once, and on a match skips to the matching close
  * tag counting same-name nesting (`<div class="footer"><div>…</div></div>`
  * drops whole). A regex `<div class="footer">.*?</div>` would stop at the
  * inner close — the reason this is a kernel, not a regexp_replace.
  * Bounded approximations, documented: attribute values containing a
  * literal `>` end the tag early, and a matched element never closed drops
  * the remainder (lxml would re-balance the tree first). Per-row cost is
  * one linear pass inside whole-stage codegen (static-forwarder pattern,
  * same as [[WinnowFingerprints]]).
  */
case class StripHtmlSelectors(child: Expression, selectors: Seq[String])
    extends UnaryExpression {

  @transient private lazy val parsed = StripHtmlSelectors.parse(selectors)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    StripHtmlSelectors.strip(input.asInstanceOf[UTF8String], parsed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // no explicit className: CodeGenerator.typeName renders the array type
    // in Java SOURCE syntax (Sel[]) — the JVM binary name ("[L…;") is not
    // compilable and would silently drop the stage to interpreted eval
    val ref = ctx.addReferenceObj("selectors", parsed)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StripHtmlSelectors.strip($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Narrow a document to the FIRST element matching a simple CSS selector —
  * the `main_by_css_selector` half of the reference's trafilatura wrapper
  * (trafilatura_extract.py:82-94: `e.cssselect(sel)` takes match [0] as
  * the extraction root; NO match returns the empty string, which the NLP
  * preprocessor then treats as extraction failure and falls back to field
  * assembly). Same selector grammar and scanning discipline as
  * [[StripHtmlSelectors]]; returns the matched element's inner HTML.
  */
case class SelectHtmlSelector(child: Expression, selector: String)
    extends UnaryExpression {

  @transient private lazy val parsed = StripHtmlSelectors.parse(Seq(selector))

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    StripHtmlSelectors.selectFirst(input.asInstanceOf[UTF8String], parsed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("selector", parsed)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StripHtmlSelectors.selectFirst($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripHtmlSelectors {

  /** One parsed simple selector: an optional required id and the set of
    * required class tokens (compound `.a.b` = all present).
    */
  final class Sel(val id: String, val classes: Array[String])
    extends Serializable

  /** `#id`, `.class`, `.a.b` compounds. Anything else (descendant
    * combinators, element names, attribute selectors) throws at plan
    * time — the reference's config corpus never uses them.
    */
  def parse(selectors: Seq[String]): Array[Sel] = selectors.map { raw =>
    val s = raw.trim
    require(s.nonEmpty && (s.startsWith("#") || s.startsWith(".")) &&
      !s.exists(c => c.isWhitespace || c == '>' || c == '[' || c == ':'),
      s"unsupported selector '$raw': only #id / .class / .a.b compounds")
    if (s.startsWith("#")) {
      require(s.length > 1 && !s.substring(1).contains("#") &&
        !s.substring(1).contains("."),
        s"unsupported selector '$raw'")
      new Sel(s.substring(1), Array.empty)
    } else {
      // a '#' inside a class selector (".banner#main") is NOT a class
      // token — reject rather than silently matching nothing
      require(!s.contains("#"), s"unsupported selector '$raw'")
      val classes = s.substring(1).split("\\.").filter(_.nonEmpty)
      require(classes.nonEmpty, s"unsupported selector '$raw': no class tokens")
      new Sel(null, classes)
    }
  }.toArray

  private[functions] val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  def strip(html: UTF8String, sels: Array[Sel]): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 3 < n && s.charAt(i + 1) == '!' &&
          s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
        val end = s.indexOf("-->", i + 4) // comments copy through opaque
        val stop = if (end < 0) n else end + 3
        out.append(s, i, stop); i = stop
      } else if (c == '<' && i + 1 < n && isNameStart(s.charAt(i + 1))) {
        val tagEnd = { val e = s.indexOf('>', i); if (e < 0) n - 1 else e }
        val name = tagName(s, i + 1, tagEnd)
        // script/style are NEVER self-closing per the HTML spec — a
        // browser treats <script .../> as an open tag whose raw text runs
        // to </script>, so the '/' syntax must not shortcut the scan
        val selfClosing = (tagEnd > i && s.charAt(tagEnd - 1) == '/' ||
          VoidTags.contains(name)) && !RawTextTags.contains(name)
        if (matches(s, i + 1 + name.length, tagEnd, sels)) {
          i = if (selfClosing) tagEnd + 1
              else if (RawTextTags.contains(name)) rawTextEnd(s, tagEnd + 1, name)
              else skipSubtree(s, tagEnd + 1, name)
        } else if (!selfClosing && RawTextTags.contains(name)) {
          // script/style content is raw text per the HTML spec: a literal
          // '<div' inside a JS string must not be selector-matched — copy
          // the whole element through opaquely
          val stop = rawTextEnd(s, tagEnd + 1, name)
          out.append(s, i, stop); i = stop
        } else {
          out.append(s, i, tagEnd + 1); i = tagEnd + 1
        }
      } else {
        out.append(c); i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  private[functions] def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private[functions] def tagName(s: String, from: Int, tagEnd: Int): String = {
    var j = from
    while (j < tagEnd && (isNameStart(s.charAt(j)) || s.charAt(j).isDigit)) j += 1
    s.substring(from, j).toLowerCase
  }

  /** Does the attr region s[from, tagEnd) satisfy any selector? */
  private def matches(s: String, from: Int, tagEnd: Int,
      sels: Array[Sel]): Boolean = {
    if (sels.isEmpty || from >= tagEnd) return false
    val attrs = s.substring(from, tagEnd)
    var id: String = null
    var classAttr: String = null
    var k = 0
    while (k < attrs.length) {
      // find an attribute name
      while (k < attrs.length && !isNameStart(attrs.charAt(k))) k += 1
      val nameStart = k
      while (k < attrs.length && (attrs.charAt(k).isLetterOrDigit ||
        attrs.charAt(k) == '-' || attrs.charAt(k) == '_')) k += 1
      val name = attrs.substring(nameStart, k).toLowerCase
      while (k < attrs.length && attrs.charAt(k).isWhitespace) k += 1
      var value: String = null
      if (k < attrs.length && attrs.charAt(k) == '=') {
        k += 1
        while (k < attrs.length && attrs.charAt(k).isWhitespace) k += 1
        if (k < attrs.length && (attrs.charAt(k) == '"' || attrs.charAt(k) == '\'')) {
          val q = attrs.charAt(k); k += 1
          val vStart = k
          while (k < attrs.length && attrs.charAt(k) != q) k += 1
          value = attrs.substring(vStart, k)
          if (k < attrs.length) k += 1
        } else {
          // HTML5: an unquoted value runs to whitespace or '>' — '/' is
          // VALUE TEXT (class=foo/bar is the token "foo/bar"); only the
          // final '/' of the self-closing syntax, right before '>',
          // is not part of the value
          val vStart = k
          while (k < attrs.length && !attrs.charAt(k).isWhitespace) k += 1
          var vEnd = k
          if (vEnd == attrs.length && vEnd > vStart && attrs.charAt(vEnd - 1) == '/')
            vEnd -= 1
          value = attrs.substring(vStart, vEnd)
        }
      }
      if (name == "id" && value != null) id = value.trim
      if (name == "class" && value != null) classAttr = value
      if (nameStart == k) k += 1 // safety: no progress → step
    }
    val classTokens: Array[String] =
      if (classAttr == null) Array.empty else classAttr.trim.split("\\s+")
    var si = 0
    while (si < sels.length) {
      val sel = sels(si)
      val idOk = sel.id == null || sel.id == id
      var clsOk = true
      var ci = 0
      while (clsOk && ci < sel.classes.length) {
        clsOk = classTokens.contains(sel.classes(ci)); ci += 1
      }
      if (idOk && clsOk && (sel.id != null || sel.classes.nonEmpty)) return true
      si += 1
    }
    false
  }

  /** First element matching any of `sels` → its inner HTML; no match →
    * the empty string (the reference's not-found contract,
    * trafilatura_extract.py:88-94). Comments and raw-text elements scan
    * opaquely; a matched void/self-closing element has empty content.
    */
  def selectFirst(html: UTF8String, sels: Array[Sel]): UTF8String = {
    val s = html.toString
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 3 < n && s.charAt(i + 1) == '!' &&
          s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (c == '<' && i + 1 < n && isNameStart(s.charAt(i + 1))) {
        val tagEnd = { val e = s.indexOf('>', i); if (e < 0) n - 1 else e }
        val name = tagName(s, i + 1, tagEnd)
        val selfClosing = (tagEnd > i && s.charAt(tagEnd - 1) == '/' ||
          VoidTags.contains(name)) && !RawTextTags.contains(name)
        if (matches(s, i + 1 + name.length, tagEnd, sels)) {
          if (selfClosing) return UTF8String.EMPTY_UTF8
          val until =
            if (RawTextTags.contains(name)) {
              val e = rawTextEnd(s, tagEnd + 1, name)
              // back up over the close tag rawTextEnd consumed
              val lt = s.lastIndexOf("</", e - 1)
              if (lt >= tagEnd + 1) lt else e
            } else MainContainer.subtreeContentEnd(s, tagEnd + 1, name)
          return UTF8String.fromString(s.substring(tagEnd + 1, until))
        }
        i = if (!selfClosing && RawTextTags.contains(name))
              rawTextEnd(s, tagEnd + 1, name)
            else tagEnd + 1
      } else i += 1
    }
    UTF8String.EMPTY_UTF8
  }

  /** script/style hold RAW TEXT per the HTML parsing spec: markup inside
    * them does not nest, and only the matching close tag terminates them.
    * Both scanners treat their content as opaque so a literal '</div>' or
    * '<div' inside a JS string cannot miscount nesting or match a selector.
    */
  private[functions] val RawTextTags = Set("script", "style")

  /** Position just after the matching `</name>` of a raw-text element,
    * scanning the content opaquely. Unclosed → end of input.
    */
  private[functions] def rawTextEnd(s: String, from: Int, name: String): Int = {
    val n = s.length
    var i = from
    while (i < n) {
      val lt = s.indexOf("</", i)
      if (lt < 0) return n
      // bound the name scan one char past the expected length so a longer
      // name ("styles") cannot alias the tag we are looking for
      val bound = math.min(lt + 2 + name.length + 1, n)
      if (tagName(s, lt + 2, bound) == name) {
        val e = s.indexOf('>', lt)
        return if (e < 0) n else e + 1
      }
      i = lt + 2
    }
    n
  }

  /** Skip from just after the matched open tag's '>' to just after the
    * matching close tag, counting same-name nesting. Never-closed →
    * end of input (drops the remainder, documented). script/style
    * content inside the subtree is skipped opaquely via [[rawTextEnd]].
    */
  private[functions] def skipSubtree(s: String, from: Int, name: String): Int = {
    val n = s.length
    var depth = 1
    var i = from
    while (i < n && depth > 0) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return n
      if (s.startsWith("<!--", lt)) { // a commented-out tag must not count
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else {
      val close = lt + 1 < n && s.charAt(lt + 1) == '/'
      val nameFrom = if (close) lt + 2 else lt + 1
      if (nameFrom < n && isNameStart(s.charAt(nameFrom))) {
        val tagEnd = { val e = s.indexOf('>', lt); if (e < 0) n - 1 else e }
        val t = tagName(s, nameFrom, tagEnd)
        val selfClosing = (s.charAt(tagEnd - 1) == '/' || VoidTags.contains(t)) &&
          !RawTextTags.contains(t) // script/style never self-close (HTML spec)
        if (t == name) {
          if (close) depth -= 1
          else if (!selfClosing) depth += 1
        }
        i = if (!close && !selfClosing && RawTextTags.contains(t))
              rawTextEnd(s, tagEnd + 1, t) // opaque: '</div>' in JS text
            else tagEnd + 1
      } else i = lt + 1
      }
    }
    i
  }
}
