package graft.html
object ParseBench {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    sb.append("""<html prefix="besluit: http://data.vlaanderen.be/ns/besluit# prov: http://www.w3.org/ns/prov#"><body>""")
    for (i <- 0 until 200) {
      sb.append(s"""<div about="https://example.org/besluit/B$i" typeof="besluit:Besluit"><span property="eli:title">Reglement $i</span><time property="besluit:openbareTitel" datetime="2023-05-04">4 mei 2023</time><div property="prov:value" datatype="rdf:HTML"><p>full <b>decision</b> body &eacute; $i</p><table><tr><td>a</td><td>b</td></tr></table></div><a property="eli:cites" href="https://example.org/besluit/B0">earlier</a></div>""")
    }
    sb.append("</body></html>")
    val page = sb.toString
    println(s"page bytes ${page.length}")
    def best(label: String)(body: => Unit): Unit = {
      var mn = Double.MaxValue
      (0 until 7).foreach { _ =>
        val t0 = System.nanoTime()
        (0 until 50).foreach(_ => body)
        mn = math.min(mn, (System.nanoTime() - t0) / 1e6 / 50)
      }
      println(f"$label ms/iter $mn%.2f")
    }
    // warmup
    (0 until 50).foreach(_ => RdfaExtractor.extract(page, "https://x.org/p"))
    val root = HtmlParser.parse(page)
    best("parse-only")(HtmlParser.parse(page))
    best("extract")(RdfaExtractor.extract(page, "https://x.org/p"))
    best("render")(HtmlParser.render(root))
  }
}
