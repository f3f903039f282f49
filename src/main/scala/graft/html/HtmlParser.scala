package graft.html

import scala.collection.mutable

/** Minimal, tolerant HTML parser — tokenizer + tree builder, no external
  * dependencies (the environment is intentionally offline; the reference
  * leans on jsdom, lib/rdfa-extractor.js:72-74, which we replace with ~200
  * lines sufficient for the RDFa attribute walk).
  *
  * Supported: nested elements, attributes (double/single/unquoted/bare),
  * comments (including WHATWG's abrupt "<!-->" and "--!>" endings),
  * doctype/processing instructions, void elements, self-closing syntax,
  * raw-text elements (script/style, serialized raw), CRLF input
  * normalization, character references per the spec's tokenizer — the
  * HTML4 named table, the legacy semicolon-less set with attribute
  * suppression, and numeric refs with the windows-1252 C1 remap and
  * U+FFFD fallbacks — mismatched end tags (closed by popping to the
  * nearest matching open element, else ignored — the usual lenient
  * behavior), the WHATWG implied-end-tag rules
  * with their real scope walks (a block start tag closes an open `p` in
  * BUTTON SCOPE, popping intervening inline elements: `<p>a<b>c<p>d`
  * ends the first paragraph at "ac"; `li`/`dt`/`dd` close their open
  * siblings through phrasing content, stopping at special-category
  * blocks; a current `option` pops on option/optgroup starts; `rt`/`rp`
  * generate implied end tags only with a `ruby` in scope; a `table`
  * start at a table insertion point acts as `</table>` first) — plus,
  * inside tables, the two WHATWG recovery paths that move RDFa-visible
  * content: "clear the stack back to a table(/body/row) context" for
  * structural start tags, and FOSTER PARENTING (non-whitespace text and
  * non-table elements at a structural insertion point are hoisted before
  * the table, like jsdom — which changes a `<table property=…>`'s
  * extracted literal). Not a full WHATWG tree builder: no adoption
  * agency / active-formatting reconstruction — a formatting element
  * closed by a scope walk is NOT re-cloned into the next block, so a
  * property-carrying `<b>` spanning paragraphs yields one triple, not
  * jsdom's two; harvested besluit pages don't carry RDFa on formatting
  * elements.
  */
object HtmlParser {

  sealed trait Node {
    /** Concatenated descendant text (entity-decoded). */
    def text: String
  }

  final case class TextNode(content: String) extends Node {
    def text: String = content
  }

  final case class Element(
      tag: String,
      attrs: Map[String, String],
      children: Vector[Node]) extends Node {
    def attr(name: String): Option[String] = attrs.get(name)
    /** DOM textContent: a <template>'s contents live in a separate
      * fragment — its childNodes are empty, so its text contributes
      * NOTHING to an ancestor's literal (innerHTML still serializes
      * the contents, like the DOM's template.innerHTML does). */
    def text: String = children.map {
      case e: Element if e.tag == "template" => ""
      case n => n.text
    }.mkString
    /** Re-serialized inner HTML (for rdf:HTML literals, G2). */
    def innerHtml: String = children.map(render).mkString
  }

  private val voidElements = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextElements = Set("script", "style")

  /** Insertion points where character data and non-table elements cannot
    * legally live — WHATWG foster-parents them BEFORE the table. `caption`
    * and the cells are excluded: they hold flow content normally. */
  private val fosterContext = Set("table", "tbody", "thead", "tfoot", "tr")

  /** Start tags that belong to the table structure (inserted in place,
    * never foster-parented). */
  private val tableLegal = Set("caption", "col", "colgroup", "tbody", "td",
    "tfoot", "th", "thead", "tr", "style", "script", "template", "form")

  /** Parse a full document; returns a synthetic root element. */
  def parse(html: String): Element = {
    // WHATWG input-stream preprocessing: CRLF and lone CR normalize to
    // LF before tokenization — a property literal from a Windows-
    // authored (CRLF) page carries \n exactly as jsdom's does
    val normalized =
      if (html.indexOf('\r') >= 0)
        html.replace("\r\n", "\n").replace('\r', '\n')
      else html
    val tokens = tokenize(normalized)
    val root = new Builder("#root", Map.empty)
    root.owner = root
    val stack = mutable.Stack[Builder](root)

    // Foster parenting (WHATWG "appropriate place for inserting a node"
    // with foster parenting enabled): while the insertion point is a
    // table-structural element, non-whitespace text and non-table start
    // tags are inserted into the NEAREST table's parent, immediately
    // before the table — jsdom does this, and it moves stray text OUT of
    // a <table property=…> element's extracted literal. The insert goes
    // at the table's placeholder index in its owner; every sibling
    // placeholder at-or-after that index (the table itself, and any
    // still-open fostered sibling) shifts one right.
    def fosterSpot(): Option[(Builder, Int)] =
      stack.find(_.tag == "table").map { t =>
        val owner = t.owner
        val at = t.placeholderIndex
        owner.children.insert(at, null)
        owner.childBuilders.foreach { cb =>
          if (cb.placeholderIndex >= at) cb.placeholderIndex += 1
        }
        (owner, at)
      }

    tokens.foreach {
      case Tok.Text(t) =>
        if (t.nonEmpty) {
          if (fosterContext(stack.top.tag) && t.trim.nonEmpty) {
            fosterSpot() match {
              case Some((owner, at)) => owner.children(at) = TextNode(t)
              case None => stack.top.children += TextNode(t)
            }
          } else stack.top.children += TextNode(t)
        }
      case Tok.Open(tag, attrs, selfClosing) =>
        impliedEndTags(stack, tag)
        // a table start never fosters: at a structural point the
        // implied-end step above just closed the outer table (WHATWG's
        // act-as-</table> rule), and inside a CELL a nested table is
        // legal in-body content
        val fostered =
          if (fosterContext(stack.top.tag) && !tableLegal(tag) && tag != "table")
            fosterSpot()
          else None
        if (selfClosing || voidElements(tag)) {
          val el = Element(tag, attrs, Vector.empty)
          fostered match {
            case Some((owner, at)) => owner.children(at) = el
            case None => stack.top.children += el
          }
        } else {
          val b = new Builder(tag, attrs)
          fostered match {
            case Some((owner, at)) =>
              owner.childBuilders += b
              b.owner = owner
              b.placeholderIndex = at
            case None =>
              stack.top.childBuilders += b
              stack.top.children += null // placeholder, patched on close
              b.owner = stack.top
              b.placeholderIndex = stack.top.children.length - 1
          }
          stack.push(b)
        }
      case Tok.Close(tag) =>
        if (stack.exists(b => b.tag == tag && b.tag != "#root")) {
          while (stack.top.tag != tag) finish(stack)
          finish(stack)
        } // else: stray end tag, ignored
    }
    while (stack.top.tag != "#root") finish(stack)
    root.build()
  }

  private def finish(stack: mutable.Stack[Builder]): Unit = {
    val done = stack.pop()
    done.owner.children(done.placeholderIndex) = done.build()
  }

  /** Start tags whose appearance closes an open `p` element — the
    * COMPLETE WHATWG "close a p element in button scope" list from the
    * in-body insertion mode (including the legacy/obsolete members
    * `center`/`dir`/`listing`/`plaintext`/`xmp` and the newer
    * `dialog`/`search`, so legacy government markup closes paragraphs
    * the way a browser would). `li`/`dt`/`dd` run the same p-closing
    * step on their own branch below. */
  private val closesP = Set("address", "article", "aside", "blockquote",
    "center", "details", "dialog", "dir", "div", "dl", "fieldset",
    "figcaption", "figure", "footer", "form", "h1", "h2", "h3", "h4",
    "h5", "h6", "header", "hgroup", "hr", "listing", "main", "menu",
    "nav", "ol", "p", "plaintext", "pre", "search", "section", "summary",
    "table", "ul", "xmp")

  /** Table-structural start tags and what they clear: WHATWG's "clear
    * the stack back to a table context" pops everything up to the
    * `table` element, so a section/caption/colgroup start closes any
    * open section, caption, colgroup, row or cell. */
  private val tableSection = Set("caption", "colgroup", "thead", "tbody", "tfoot")
  private val tableInner = tableSection ++ Set("tr", "td", "th")

  /** Implied end tags for `<p>a<p>b`-style machine markup: pop the
    * innermost open element when the incoming start tag implies its
    * close. Restricted to the innermost element (no scope walk) so
    * well-nested documents are untouched. The sibling-closing start
    * tags (`li`/`dt`/`dd`/`td`/`th`/`tr`) also close an open `p` —
    * they are all on the WHATWG "closes a p element in button scope"
    * path too (`<ul><li><p>a<li>b`: the second `li` first closes the
    * `p`, then the sibling `li`); the tailrec re-check pops both.
    * Table-structural tags (`thead`/`tbody`/`tfoot`/`caption`/
    * `colgroup`) clear back to table context — an open chain of
    * section→row→cell pops one frame per re-check; `rt`/`rp` and
    * `option`/`optgroup` close their siblings per the spec's implied-
    * end-tag set. */
  /** "Clear the stack back to a table (/body/row) context": with a table
    * open, a structural start tag pops EVERY element down to its context
    * frame — not just tableInner tops — so `<table><tr><td><p>a<tbody>`
    * closes p, td and tr before the tbody opens (WHATWG; a fostered
    * element left open is closed the same way). Outside a table the old
    * innermost-only rules apply: there is no table to clear back to. */
  private val tableBodyCtx = Set("table", "tbody", "thead", "tfoot", "#root")
  private val tableRowCtx = tableBodyCtx + "tr"

  /** WHATWG "has a `p` element in button scope": the search for the open
    * `p` walks DOWN the stack through inline/formatting elements and
    * stops at these barriers — so `<p>a<b>c<p>` closes the first p
    * (popping the b with it) while a p outside a table cell or button
    * is never closed from inside one. */
  private val buttonScopeBarrier = Set("applet", "caption", "html", "table",
    "td", "th", "marquee", "object", "template", "button", "#root")

  /** The spec's "special" category members relevant to the li/dd/dt
    * sibling walk: the walk from the stack top stops at any of these
    * (except address/div/p, which it walks through). */
  private val liWalkBarrier = Set("applet", "article", "aside", "blockquote",
    "body", "button", "caption", "center", "col", "colgroup", "dl",
    "details", "dialog", "dir", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "html", "listing", "main", "marquee", "menu", "nav",
    "object", "ol", "plaintext", "pre", "search", "section", "select",
    "summary", "table", "tbody", "td", "template", "tfoot", "th", "thead",
    "tr", "ul", "xmp", "#root")

  /** Pop until the builder at stack index `idx` (inclusive) is closed. */
  private def popThrough(stack: mutable.Stack[Builder], idx: Int): Unit = {
    var i = idx
    while (i >= 0) { finish(stack); i -= 1 }
  }

  /** WHATWG "close a p element in button scope", the scope-walking form:
    * pop everything down to and including the nearest open `p`, unless a
    * scope barrier intervenes. `<p>a<b>c<p>d`: the second p start closes
    * the first p AND the b — matching jsdom's literal extents for a
    * `<p property=…>` (the reconstruction of active formatting elements
    * around "d" is NOT mirrored; see the class doc). */
  private def closePInButtonScope(stack: mutable.Stack[Builder]): Unit = {
    val idx = stack.indexWhere(b => b.tag == "p" || buttonScopeBarrier(b.tag))
    if (idx >= 0 && stack(idx).tag == "p") popThrough(stack, idx)
  }

  /** The li (and dd/dt) sibling walk: from the stack top, close an open
    * sibling through phrasing content (`<li><b>x<li>` pops b and li) but
    * stop at special-category blocks other than address/div/p. */
  private def closeSibling(stack: mutable.Stack[Builder], targets: Set[String]): Unit = {
    val idx = stack.indexWhere(b => targets(b.tag) || liWalkBarrier(b.tag))
    if (idx >= 0 && targets(stack(idx).tag)) popThrough(stack, idx)
  }

  private def impliedEndTags(stack: mutable.Stack[Builder], tag: String): Unit = {
    def inTable = stack.exists(_.tag == "table")
    tag match {
      case "table" =>
        // in-body table start closes a p in button scope like the rest
        // of the closesP family — AND, at a TABLE insertion point,
        // WHATWG in-table acts as </table> first: "<table><table>"
        // builds two sibling tables ("<table><tr><table>" ends the row
        // with its table). Inside a cell or caption the content mode is
        // in-body again, where a nested table is legal and stays nested.
        closePInButtonScope(stack)
        val idx = stack.indexWhere(b => b.tag == "table" || b.tag == "td" ||
          b.tag == "th" || b.tag == "caption" || b.tag == "#root")
        if (idx >= 0 && stack(idx).tag == "table") popThrough(stack, idx)
      case t if closesP(t) => closePInButtonScope(stack)
      case "li" =>
        closeSibling(stack, Set("li")); closePInButtonScope(stack)
      case "dt" | "dd" =>
        closeSibling(stack, Set("dt", "dd")); closePInButtonScope(stack)
      case "tr" =>
        if (inTable) while (!tableBodyCtx(stack.top.tag)) finish(stack)
        else innermostLegacy(stack, tag)
      case "td" | "th" =>
        if (inTable) while (!tableRowCtx(stack.top.tag)) finish(stack)
        else innermostLegacy(stack, tag)
      case t if tableSection(t) =>
        if (inTable)
          while (stack.top.tag != "table" && stack.top.tag != "#root") finish(stack)
        else innermostLegacy(stack, tag)
      case "rt" | "rp" =>
        // in-body rt/rp: ONLY with a ruby element in scope do they
        // generate implied end tags (closing an open rt/rp/rb down to
        // the ruby); without one they are generic starts and nest —
        // "<rp><rt>" outside ruby keeps the rt inside the rp, exactly
        // as jsdom builds it
        val idx = stack.indexWhere(b => b.tag == "ruby" || rubyScopeBarrier(b.tag))
        if (idx >= 0 && stack(idx).tag == "ruby")
          while (impliedEndSet(stack.top.tag)) finish(stack)
      case "option" | "optgroup" =>
        // in-body: both starts pop a current OPTION only; optgroup does
        // NOT close an open optgroup outside a select (spec-literal,
        // like jsdom — the in-select rules are not modelled)
        if (stack.top.tag == "option") finish(stack)
      case _ => ()
    }
  }

  /** Regular-scope barriers for the ruby search (WHATWG "has a ruby
    * element in scope"). */
  private val rubyScopeBarrier = Set("applet", "caption", "html", "table",
    "td", "th", "marquee", "object", "template", "#root")

  /** The spec's "generate implied end tags" set. */
  private val impliedEndSet = Set("dd", "dt", "li", "optgroup", "option",
    "p", "rb", "rp", "rt", "rtc")

  /** The pre-scope-walk innermost-only sibling rules, kept for the
    * table-structural tags OUTSIDE any table (nothing to clear back to)
    * and the option/ruby families. */
  @annotation.tailrec
  private def innermostLegacy(stack: mutable.Stack[Builder], tag: String): Unit = {
    val top = stack.top.tag
    val close = tag match {
      case "tr"                => top == "tr" || top == "td" || top == "th" ||
                                  top == "caption" || top == "colgroup" || top == "p"
      case "td" | "th"         => top == "td" || top == "th" ||
                                  top == "caption" || top == "colgroup" || top == "p"
      case t if tableSection(t) => tableInner(top)
      case _                   => false
    }
    if (close) { finish(stack); innermostLegacy(stack, tag) }
  }

  private final class Builder(val tag: String, val attrs: Map[String, String]) {
    val children = mutable.ArrayBuffer[Node]()
    val childBuilders = mutable.ArrayBuffer[Builder]()
    /** The builder whose `children` hold this builder's placeholder —
      * the stack parent normally, the table's parent when fostered. */
    var owner: Builder = null
    var placeholderIndex: Int = -1
    def build(): Element = {
      // any still-null placeholders are unclosed children finished bottom-up
      Element(tag, attrs, children.iterator.filter(_ != null).toVector)
    }
  }

  // -------------------------------------------------------------- tokens

  private object Tok {
    sealed trait T
    final case class Text(t: String) extends T
    final case class Open(tag: String, attrs: Map[String, String],
        selfClosing: Boolean) extends T
    final case class Close(tag: String) extends T
  }

  private def tokenize(s: String): Iterator[Tok.T] = new Iterator[Tok.T] {
    private var i = 0
    private var pendingRawText: String = null

    def hasNext: Boolean = i < s.length || pendingRawText != null

    def next(): Tok.T = {
      if (pendingRawText != null) {
        val t = Tok.Text(pendingRawText); pendingRawText = null; return t
      }
      if (s(i) != '<') {
        val start = i
        val lt = s.indexOf('<', i)
        i = if (lt < 0) s.length else lt
        // WHATWG: raw NUL character tokens are ignored by the in-body
        // tree builder — they vanish from text (an entity &#0; instead
        // decodes to U+FFFD in decodeEntities, a different rule)
        val txt = s.substring(start, i)
        return Tok.Text(decodeEntities(
          if (txt.indexOf('\u0000') >= 0) txt.replace("\u0000", "") else txt,
          isAttr = false))
      }
      // '<'
      if (s.startsWith("<!--", i)) {
        // WHATWG comment endings: "<!-->" and "<!--->" close ABRUPTLY
        // (an empty comment, not a swallow-the-document scan), and
        // "--!>" (incorrectly-closed) ends a comment like "-->" does —
        // whichever terminator comes first
        val after = i + 4
        if (s.startsWith(">", after)) i = after + 1
        else if (s.startsWith("->", after)) i = after + 2
        else {
          val end1 = s.indexOf("-->", after)
          val end2 = s.indexOf("--!>", after)
          i =
            if (end2 >= 0 && (end1 < 0 || end2 < end1)) end2 + 4
            else if (end1 >= 0) end1 + 3
            else s.length
        }
        return Tok.Text("")
      }
      if (i + 1 < s.length && (s(i + 1) == '!' || s(i + 1) == '?')) {
        val end = s.indexOf('>', i)
        i = if (end < 0) s.length else end + 1
        return Tok.Text("")
      }
      if (i + 1 < s.length && s(i + 1) == '/') {
        // WHATWG end-tag-open: a letter starts an end tag whose NAME is
        // the leading run — trailing junk (attributes on an end tag,
        // "</div foo>") is parse-error noise and the div still closes;
        // a NON-letter makes the whole thing a bogus comment ("</ div>",
        // "</3>" close nothing)
        val end = s.indexOf('>', i)
        if (end < 0) { i = s.length; return Tok.Text("") }
        val c2 = if (i + 2 < s.length) s(i + 2) else ' '
        if ((c2 >= 'a' && c2 <= 'z') || (c2 >= 'A' && c2 <= 'Z')) {
          var j = i + 2
          while (j < end && s(j) != ' ' && s(j) != '\t' && s(j) != '\n' &&
            s(j) != '\f' && s(j) != '\r' && s(j) != '/') j += 1
          val tag = s.substring(i + 2, j).toLowerCase(java.util.Locale.ROOT)
          i = end + 1
          return Tok.Close(tag)
        }
        i = end + 1 // bogus comment: consumed, emits nothing
        return Tok.Text("")
      }
      // open tag
      parseOpenTag() match {
        case Some(open) =>
          if (rawTextElements(open.tag) && !open.selfClosing) {
            val end = indexOfIgnoreCaseAscii(s, s"</${open.tag}", i)
            if (end >= 0) {
              // script-data tokenization maps NUL to U+FFFD (unlike
              // body text, where NUL tokens are dropped)
              pendingRawText = s.substring(i, end).replace('\u0000', '\ufffd')
              i = end
            }
          }
          open
        case None =>
          // lone '<' that isn't a tag — treat literally
          i += 1
          Tok.Text("<")
      }
    }

    private def parseOpenTag(): Option[Tok.Open] = {
      var j = i + 1
      val nameStart = j
      // WHATWG tag-open: only an ASCII LETTER starts a tag — "<3" is
      // literal text, not an element named "3"
      if (j >= s.length ||
          !((s(j) >= 'a' && s(j) <= 'z') || (s(j) >= 'A' && s(j) <= 'Z')))
        return None
      while (j < s.length && (s(j).isLetterOrDigit || s(j) == '-' || s(j) == ':')) j += 1
      val tag = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
      // Insertion-ordered: re-serialization (render/innerHtml) must emit
      // attributes in source order like jsdom's innerHTML — a hash Map
      // goes hash-order above 4 entries. First occurrence wins on
      // duplicates (HTML parsing spec; jsdom drops later duplicates).
      var attrs = scala.collection.immutable.VectorMap.empty[String, String]
      def putAttr(name: String, value: String): Unit =
        if (!attrs.contains(name)) attrs = attrs.updated(name, value)
      var selfClosing = false
      var done = false
      while (!done && j < s.length) {
        while (j < s.length && s(j).isWhitespace) j += 1
        if (j >= s.length) done = true
        else s(j) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < s.length && s(j + 1) == '>') { selfClosing = true; j += 2; done = true }
            else j += 1
          case _ =>
            val aStart = j
            while (j < s.length && !s(j).isWhitespace && s(j) != '=' &&
              s(j) != '>' && s(j) != '/') j += 1
            // Locale.ROOT: a default Turkish locale would map 'I' to a
            // dotless ı and break PROPERTY/ABOUT lookups
            val name = s.substring(aStart, j).toLowerCase(java.util.Locale.ROOT)
            while (j < s.length && s(j).isWhitespace) j += 1
            if (j < s.length && s(j) == '=') {
              j += 1
              while (j < s.length && s(j).isWhitespace) j += 1
              if (j < s.length && (s(j) == '"' || s(j) == '\'')) {
                val quote = s(j); j += 1
                val vStart = j
                while (j < s.length && s(j) != quote) j += 1
                putAttr(name, decodeEntities(s.substring(vStart, j), isAttr = true))
                if (j < s.length) j += 1
              } else {
                val vStart = j
                while (j < s.length && !s(j).isWhitespace && s(j) != '>') j += 1
                putAttr(name, decodeEntities(s.substring(vStart, j), isAttr = true))
              }
            } else if (name.nonEmpty) putAttr(name, "")
        }
      }
      i = j
      Some(Tok.Open(tag, attrs, selfClosing))
    }
  }

  /** Locale-independent, allocation-free case-insensitive search (ASCII
    * needle). `String.toLowerCase` over the document is both index-unsafe
    * (length-changing mappings like U+0130 shift offsets) and
    * locale-dependent ('I' under a Turkish default locale never matches
    * "</script") — and it copies the whole document per raw-text tag. */
  private def indexOfIgnoreCaseAscii(hay: String, needle: String, from: Int): Int = {
    // ASCII-only fold: HTML mandates ASCII-case-insensitive end-tag
    // matching, and Unicode folding would false-match e.g. U+0130 'İ' or
    // U+212A Kelvin sign against 'i'/'k'.
    @inline def fold(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    val n = needle.length
    var i = math.max(from, 0)
    val limit = hay.length - n
    while (i <= limit) {
      var j = 0
      while (j < n && fold(hay(i + j)) == fold(needle(j))) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------ entities

  /** The fast local subset (hit on virtually every reference): XML
    * basics (incl. `apos`, which HTML4 lacks) and the accents/dashes
    * besluit pages actually carry. Anything else non-numeric falls
    * through to commons-text's complete HTML4 table (shipped with
    * Spark), so `&euml;`/`&alpha;`/`&hearts;` all decode; HTML5-only
    * long names are the remaining (rare) literals. */
  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "euro" -> "€", "mdash" -> "—", "ndash" -> "–",
    "rsquo" -> "’", "lsquo" -> "‘",
    "ldquo" -> "“", "rdquo" -> "”", "hellip" -> "…")

  /** WHATWG numeric-character-reference value mapping: NUL, surrogates
    * and beyond-Unicode turn into U+FFFD, and the C1 block 0x80–0x9F
    * takes the windows-1252 remap — scraped CMS output is full of
    * `&#146;`-style smart quotes that MUST decode as ’, not as a C1
    * control (jsdom, the reference's parser, does the same). */
  private val win1252Remap: Map[Int, Int] = Map(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)

  private def numericRef(cp0: Long): String = {
    val cp =
      if (cp0 == 0L || cp0 > 0x10FFFFL ||
          (cp0 >= 0xD800L && cp0 <= 0xDFFFL)) 0xFFFD
      else win1252Remap.getOrElse(cp0.toInt, cp0.toInt)
    new String(Character.toChars(cp))
  }

  /** WHATWG legacy (semicolon-less) named references: exactly the
    * HTML4 basic + Latin-1 sets, plus their historical uppercase
    * aliases — "&copy 2023" is "\u00a9 2023" and "&ampx" is "&x" in
    * TEXT; in an ATTRIBUTE a legacy match followed by [a-zA-Z0-9=]
    * does not decode, so query strings like "?a=1&copy=2" stay intact
    * (the spec's attribute suppression rule). */
  private val legacyEntities: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val commons =
      (org.apache.commons.text.translate.EntityArrays.BASIC_UNESCAPE.asScala ++
        org.apache.commons.text.translate.EntityArrays.ISO8859_1_UNESCAPE.asScala)
        .map { case (k, v) =>
          k.toString.stripPrefix("&").stripSuffix(";") -> v.toString }
    commons.toMap ++ Map("AMP" -> "&", "LT" -> "<", "GT" -> ">",
      "QUOT" -> "\"", "COPY" -> "\u00a9", "REG" -> "\u00ae")
  }
  private val legacyMaxLen = legacyEntities.keysIterator.map(_.length).max

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  def decodeEntities(t: String, isAttr: Boolean = false): String = {
    if (t.indexOf('&') < 0) return t
    val sb = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      if (t(i) == '&' && i + 1 < t.length) {
        val c1 = t(i + 1)
        if (c1 == '#') {
          // numeric reference: the value is emitted whether or not a
          // semicolon follows ("&#65x" is "Ax" with a parse error) —
          // the spec's missing-semicolon rule; the value accumulator
          // saturates, so arbitrarily long digit runs land on U+FFFD
          val hex = i + 2 < t.length && (t(i + 2) == 'x' || t(i + 2) == 'X')
          var j = i + (if (hex) 3 else 2)
          var v = 0L
          var any = false
          while (j < t.length && {
            val c = t(j)
            if (hex) isHexDigit(c) else c >= '0' && c <= '9'
          }) {
            any = true
            if (v <= 0x10FFFFL)
              v = v * (if (hex) 16 else 10) + Character.digit(t(j), 16)
            j += 1
          }
          if (any) {
            sb.append(numericRef(v))
            i = if (j < t.length && t(j) == ';') j + 1 else j
          } else { sb.append('&'); i += 1 }
        } else if (isNameChar(c1)) {
          var j = i + 1
          while (j < t.length && isNameChar(t(j))) j += 1
          val run = t.substring(i + 1, j)
          val semiDecoded: Option[String] =
            if (j < t.length && t(j) == ';')
              namedEntities.get(run).orElse {
                val ref = "&" + run + ";"
                val un = org.apache.commons.text.StringEscapeUtils.unescapeHtml4(ref)
                if (un != ref) Some(un) else None
              }
            else None
          semiDecoded match {
            case Some(d) => sb.append(d); i = j + 1
            case None =>
              // legacy fallback: longest semicolon-less prefix of the
              // run ("&notit;" is "\u00acit;", the ; belongs to no one)
              var k = math.min(run.length, legacyMaxLen)
              var hit: Option[(String, Int)] = None
              while (k >= 2 && hit.isEmpty) {
                legacyEntities.get(run.substring(0, k)) match {
                  case Some(v2) => hit = Some((v2, i + 1 + k))
                  case None => k -= 1
                }
              }
              hit match {
                case Some((v2, next))
                    if !(isAttr && next < t.length &&
                      (t(next) == '=' || isNameChar(t(next)))) =>
                  sb.append(v2); i = next
                case _ => sb.append('&'); i += 1
              }
          }
        } else { sb.append('&'); i += 1 }
      } else { sb.append(t(i)); i += 1 }
    }
    sb.toString
  }

  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')



  /** Re-serialize a node (innerHtml support). Attributes emit in SOURCE
    * order (the tokenizer builds a VectorMap), matching jsdom's
    * order-preserving innerHTML at any attribute count. */
  def render(n: Node): String = n match {
    case TextNode(t) => escapeText(t)
    case e: Element =>
      val attrs = e.attrs.map { case (k, v) =>
        s""" $k="${v.replace("&", "&amp;").replace("\"", "&quot;")}""""
      }.mkString
      // HTML serialization writes voids with NO self-closing slash —
      // jsdom's innerHTML emits "<br>", and the G2 externalized literal
      // must match the reference's bytes
      if (voidElements(e.tag)) s"<${e.tag}$attrs>"
      else if (rawTextElements(e.tag))
        // the HTML serialization of a raw-text element emits its text
        // UNescaped (the parser never entity-decodes it, so escaping
        // here would double-encode on every parse→render round trip —
        // and jsdom's outerHTML, which the reference externalizes,
        // emits raw too). Always re-readable: the raw-text scan stops
        // at the first "</tag", so parsed raw text can never contain
        // its own terminator.
        s"<${e.tag}$attrs>${e.children.collect { case TextNode(t) => t }.mkString}</${e.tag}>"
      else s"<${e.tag}$attrs>${e.children.map(render).mkString}</${e.tag}>"
  }

  private def escapeText(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Depth-first traversal of an element and its descendants. */
  def walk(root: Element)(f: Element => Unit): Unit = {
    f(root)
    root.children.foreach {
      case e: Element => walk(e)(f)
      case _ =>
    }
  }
}
