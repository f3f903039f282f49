package graft.html

/** Dev harness: hunt minimal render→reparse CONVERGENCE violations
  * (the HtmlFuzzSpec property) — one-trip non-idempotence is expected
  * for foster-parented content (browsers too), so only a second round
  * trip that still changes the serialization is a finding. */
object FixpointHunt {
  def main(args: Array[String]): Unit = {
    val tags = Seq("div", "span", "p", "a", "time", "script", "style", "br",
      "x-widget", "table", "tbody", "thead", "tfoot", "tr", "td", "th",
      "caption", "colgroup", "button", "ul", "li", "dl", "dt", "dd",
      "select", "option", "optgroup", "ruby", "rt", "rp",
      // spec tag names run to whitespace/'/'/'>' (Word-export <o:p>,
      // underscores/dots/braces, non-ASCII preserved by the ASCII fold)
      "o:p", "foo_bar", "x.y", "b{c}", "xÉy",
      "col", "hr", "input", "img",
      "b", "i", "em", "strong", "nobr", "code", "u", "small", "font",
      "svg", "math", "foreignobject", "mi", "annotation-xml", "circle",
      "g", "clippath", "mglyph", "desc",
      // RCDATA / extended raw text / leading-LF elements
      "title", "textarea", "iframe", "xmp", "pre", "listing", "form",
      // wrappers: merge-and-ignore + the no-pop end-tag path
      "html", "head", "body", "frameset",
      // PLAINTEXT: totality only; bad() exempts it from convergence
      // (the spec declares its serialization non-round-trippable)
      "plaintext")
    val junk = Seq("<", ">", "&", "\"", "'", "=", "/", "<!--", "-->", "<!",
      "]]>", "&#x41;", "&#999999999;", "&bogus;", " ", "�", "<<>>",
      "</", "<a", "=\"", "a:b", "[a:b]", "_:x", "\n", "\t", "ab", "<![CDATA[", "<![CDATA[x]]>",
      // r19 second pass: bogus-comment openers, near-miss raw-text
      // terminators, missing-end-tag-name, decoded-LF, '='-led attrs
      "<?", "<?php x?>", "</3>", "</ x>", "</>", "<!x>", "</titlex>",
      "</scriptx>", "&#10;", "<div =x>", "--!>", "<!-->",
      // r19 third pass: uppercase legacy entities (with-semicolon
      // variants), end-tag attribute junk with a quoted '>'
      "&AMP;", "&COPY;", "&GT", "</div a=\">\">", "</b x='>'>",
      "\u00a0", "&nbsp;")
    // r19: doctype preambles (quirks vs standards gates table-in-p) and
    // foreign-content shapes — case-adjusted attrs, self-closing syntax,
    // integration-point encodings — per the r18 verdict's item 7
    val doctypes = Seq("", "", "", "", "<!DOCTYPE html>",
      "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 3.2//EN\">",
      "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\">",
      "<!DOCTYPE>", "<!DOCTYPE html SYSTEM \"a>b\">",
      "<!DOCTYPE html PUBLIC \"untermin")
    val foreignAttrs = Seq("viewBox=\"0 0 1 1\"", "xlink:href=\"#x\"",
      "definitionURL=\"d\"", "encoding=\"text/html\"",
      "encoding=\"application/xhtml+xml\"", "color=\"red\"")
    // seed configurable: `Test/runMain graft.html.FixpointHunt [seed]`
    val rnd = new scala.util.Random(
      if (args.nonEmpty) args(0).toLong else 42L)
    def frag(): String = rnd.nextInt(6) match {
      case 0 => s"<${tags(rnd.nextInt(tags.size))}>"
      case 1 => s"</${tags(rnd.nextInt(tags.size))}>"
      case 2 => junk(rnd.nextInt(junk.size))
      case 3 => s"<${tags(rnd.nextInt(tags.size))}/>"
      case 4 =>
        val t = tags(rnd.nextInt(tags.size))
        s"<$t ${foreignAttrs(rnd.nextInt(foreignAttrs.size))}>"
      case _ => "w" + rnd.nextInt(10)
    }
    def flat(doc: String): String =
      HtmlParser.parse(doc).children.map(HtmlParser.render).mkString
    def bad(doc: String): Boolean =
      !doc.toLowerCase(java.util.Locale.ROOT).contains("<plaintext") && {
        val twice = flat(flat(doc)); flat(twice) != twice
      }
    var found = 0
    var i = 0
    while (found < 8 && i < 200000) {
      i += 1
      val doc = doctypes(rnd.nextInt(doctypes.size)) +
        (0 until (1 + rnd.nextInt(6))).map(_ => frag()).mkString
      if (bad(doc)) {
        // greedy shrink: drop chars while still failing
        var cur = doc
        var progress = true
        while (progress) {
          progress = false
          var j = 0
          while (j < cur.length) {
            val cand = cur.substring(0, j) + cur.substring(j + 1)
            if (cand.nonEmpty && bad(cand)) { cur = cand; progress = true }
            else j += 1
          }
        }
        val once = flat(cur)
        val twice = flat(once)
        println(s"BAD doc=${cur.map(c => if (c < 0x20 || c > 0x7e) f"\\u${c.toInt}%04x" else c).mkString}")
        println(s"  once =$once")
        println(s"  twice=$twice")
        found += 1
      }
    }
    println(s"$found failures in $i docs")
  }
}
