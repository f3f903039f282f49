package graft.html

/** Parser micro-bench — since r19 a COMMITTED cross-round artifact
  * (`parse_bench_r{N}.json`), not just a dev harness: three rounds of
  * tree-builder work had no committed perf history, and the one real
  * parser regression so far (the r18 eager-subtree-text quadratic
  * walk, +31% extract) was caught only by a hand run.
  *
  * Method: min-of-7 passes (50 iterations each) of parse / extract /
  * render ms/page over a representative 200-decision RDFa page, with a
  * per-metric noise floor derived EXACTLY like the SQL bench's
  * (Bench.noiseFloorSec with no cal anchor: the floor is the spread of
  * samples within 2x of the metric's min). The cross-round breach rule
  * is the same mechanical form the r18 verdict froze for queries:
  *
  *   breach(m) iff min_r(m) > 1.3 * min_prev(m) + noise_floor_ms_r(m)
  *
  * Usage: `Test/runMain graft.html.ParseBench [out.json]` — prints the
  * human-readable lines and, with an argument, writes the JSON
  * artifact (committed as parse_bench_r{N}.json at round close).
  */
object ParseBench {

  /** (min, noise floor) per metric from raw samples — the derivation
    * pinned by ParseBench cases in BenchStatsSpec. No cal anchor
    * exists here (single-JVM compute, no cluster calibration pass), so
    * the floor reduces to the metric's own uncontended spread. */
  def summarize(samples: Map[String, Vector[Double]])
      : Map[String, (Double, Double)] =
    samples.map { case (k, v) =>
      k -> ((v.min, graft.Bench.noiseFloorSec(v, 0.0)))
    }

  /** The representative page: 200 besluit-style decisions with typed
    * spans, dates, an rdf:HTML body containing a table, and a citation
    * link — the attribute/structure mix the harvest pipeline sees. */
  def page: String = {
    val sb = new StringBuilder
    sb.append("""<html prefix="besluit: http://data.vlaanderen.be/ns/besluit# prov: http://www.w3.org/ns/prov#"><body>""")
    for (i <- 0 until 200) {
      sb.append(s"""<div about="https://example.org/besluit/B$i" typeof="besluit:Besluit"><span property="eli:title">Reglement $i</span><time property="besluit:openbareTitel" datetime="2023-05-04">4 mei 2023</time><div property="prov:value" datatype="rdf:HTML"><p>full <b>decision</b> body &eacute; $i</p><table><tr><td>a</td><td>b</td></tr></table></div><a property="eli:cites" href="https://example.org/besluit/B0">earlier</a></div>""")
    }
    sb.append("</body></html>")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val doc = page
    println(s"page bytes ${doc.length}")
    def samplesOf(body: => Unit): Vector[Double] =
      (0 until 7).map { _ =>
        val t0 = System.nanoTime()
        (0 until 50).foreach(_ => body)
        (System.nanoTime() - t0) / 1e6 / 50
      }.toVector
    // warmup (JIT): each measured path separately — extract warms the
    // parse+walk, but render has its own code paths, and min-of-7 on a
    // still-compiling path reads as a huge noise floor. 300 iterations,
    // not 100: at 100 the committed r19 samples still DESCENDED across
    // passes (parse 6.25 → 2.14 ms, C2 compiling into pass 5), which
    // inflates the floor and weakens the cross-round breach rule.
    val root = HtmlParser.parse(doc)
    (0 until 300).foreach { _ =>
      RdfaExtractor.extract(doc, "https://x.org/p")
      HtmlParser.parse(doc)
      HtmlParser.render(root)
    }
    val samples = Vector(
      "parse" -> samplesOf(HtmlParser.parse(doc)),
      "extract" -> samplesOf(RdfaExtractor.extract(doc, "https://x.org/p")),
      "render" -> samplesOf(HtmlParser.render(root)))
    val summary = summarize(samples.toMap)
    samples.foreach { case (k, v) =>
      val (mn, floor) = summary(k)
      println(f"$k ms/iter $mn%.2f (floor $floor%.3f)")
    }
    args.headOption.foreach { out =>
      def arr(v: Vector[Double]) =
        v.map(d => f"$d%.4f").mkString("[", ",", "]")
      val keys = samples.map(_._1)
      val json =
        s"""{"unit":"ms_per_page","page_bytes":${doc.length},""" +
          s""""passes":7,"iters_per_pass":50,""" +
          s""""breach_rule":"min_r > 1.3*min_prev + noise_floor_ms(m)",""" +
          s""""min_ms":{${keys.map(k => f""""$k":${summary(k)._1}%.4f""").mkString(",")}},""" +
          s""""noise_floor_ms":{${keys.map(k => f""""$k":${summary(k)._2}%.4f""").mkString(",")}},""" +
          s""""samples_ms":{${samples.map { case (k, v) => s""""$k":${arr(v)}""" }.mkString(",")}}}"""
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(json) finally w.close()
      println(s"wrote $out")
    }
  }
}
