package graft.html

/** Dev harness: extract each arg as an RDFa page (base http://ex.org/p)
  * and print the quads — for hand-diffing Core §7.5 edges. */
object RdfaProbe {
  def main(args: Array[String]): Unit = args.foreach { html =>
    println(s"=== $html")
    RdfaExtractor.extract(html, "http://ex.org/p").foreach { q =>
      val o = q.obj
      val ov = o.termType match {
        case graft.rdf.Term.Literal =>
          "\"" + o.value + "\"" +
            (if (o.lang != null) "@" + o.lang
             else if (o.datatype != null) "^^" + o.datatype else "")
        case _ => o.value
      }
      println(s"  ${q.subject.value} <${q.predicate.value}> $ov")
    }
  }
}
