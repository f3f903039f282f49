package graft.html

/** Dev harness: parse each arg (or stdin lines when no args) and print
  * the tree shape plus the serialization — for hand-diffing tricky
  * WHATWG cases against the spec/jsdom expectations. */
object Probe {
  def show(n: HtmlParser.Node, depth: Int, sb: StringBuilder): Unit = n match {
    case HtmlParser.CommentNode(d) =>
      sb.append("  " * depth).append("#comment ").append(d).append('\n')
    case HtmlParser.TextNode(t) =>
      sb.append("  " * depth).append("#text ").append(
        t.map(c => if (c < 0x20 || c > 0x7e) f"\\u${c.toInt}%04x" else c).mkString).append('\n')
    case e: HtmlParser.Element =>
      sb.append("  " * depth).append('<').append(if (e.ns == "html") "" else e.ns + ":").append(e.tag)
      e.attrs.toSeq.sortBy(_._1).foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
      sb.append(">\n")
      e.children.foreach(show(_, depth + 1, sb))
  }
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args.toSeq
               else scala.io.Source.stdin.getLines().toSeq
    docs.foreach { doc =>
      println(s"=== ${doc}")
      val root = HtmlParser.parse(doc)
      val sb = new StringBuilder
      root.children.foreach(show(_, 0, sb))
      print(sb)
      println("render: " + root.children.map(HtmlParser.render).mkString)
    }
  }
}
