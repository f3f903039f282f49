package graft.rdf

import scala.sys.process._

/** Dev harness: multi-seed token-soup differential sweep against node —
  * `sbt "Test/runMain graft.rdf.JsDateSoupSweep [nSeeds]"`. The spec's
  * live fuzz runs one fixed seed; this walks many, printing every
  * divergence. Exit 1 on any mismatch. */
object JsDateSoupSweep {
  def main(args: Array[String]): Unit = {
    val nSeeds = if (args.nonEmpty) args(0).toInt else 10
    val bad = sweep(1 to nSeeds)
    println(s"$bad mismatches across $nSeeds seeds")
    if (bad > 0) sys.exit(1)
  }

  /** One sweep over the given seeds; returns the mismatch count (each
    * printed). Callable both from main (dev, many seeds) and from
    * SoupSweepSmokeSpec (CI, a small fixed seed set). */
  def sweep(seeds: Seq[Int]): Int = {
    val soupTokens = Seq("2023", "05", "4", "99", "0500", "123", "60", "12",
      "1", "012023", "10:20", "10:", "::", ":", ".", ".5", "-", "+", "/",
      ",", " ", "  ", "May", "Jun", "pm", "am", "GMT", "EST", "Z", "Xyz",
      "(x)", "(", ")", ";", "%", "T", "Sat", "+02:00", "-0500",
      "99999999999", "Tt", "z", "ut", "24:00", "0x10", "1e2",
      // scanner character classes beyond ASCII: JS whitespace (NBSP,
      // ideographic space, BOM), non-whitespace look-alikes (U+2028,
      // ZWSP, Mongolian vowel separator), a C0 skip symbol, NUL
      // truncation, and the wrap-prone wide offsets/fractions
      "\u00a0", "\u3000", "\ufeff", "\u2028", "\u200b", "\u180e",
      "\u0007", "\u0000", "123456789", "05002023", ".059999999999")
    var bad = 0
    for (seed <- seeds) {
      val rnd = new scala.util.Random(900000 + seed)
      val fuzz = (0 until 600).map(_ =>
        (0 until (2 + rnd.nextInt(11)))
          .map(_ => soupTokens(rnd.nextInt(soupTokens.size)))
          .mkString(if (rnd.nextBoolean()) " " else "")).distinct
      val js = "const us=JSON.parse(require('fs').readFileSync(0,'utf8'));" +
        "const f=(d,t)=>{if(isNaN(d.getTime()))return'N';" +
        "const m=d.getMonth()<9?`0${d.getMonth()+1}`:`${d.getMonth()+1}`;" +
        "const dd=`${d.getFullYear()}-${m}-${d.getDate()}`;" +
        "return t?`${dd}T${d.getHours()}:${d.getMinutes()}:${d.getSeconds()}`:dd};" +
        "for(const u of us){const d=new Date(u);console.log(f(d,false)+'|'+f(d,true))}"
      val in = new java.io.ByteArrayInputStream(
        fuzz.map(u => "\"" + u.flatMap {
          case '\\' => "\\\\"
          case '"'  => "\\\""
          case c if c < 0x20 => f"\\u${c.toInt}%04x" // JSON forbids raw controls
          case c => c.toString
        } + "\"").mkString("[", ",", "]").getBytes("UTF-8"))
      val out = new StringBuilder
      val code = (Process(Seq("node", "-e", js), None, "TZ" -> "UTC") #< in)
        .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      require(code == 0, "node oracle failed")
      val nodeOut = out.toString.split("\n")
      fuzz.zip(nodeOut).foreach { case (input, expect) =>
        val Array(ed, edt) = expect.split("\\|", -1)
        val got = JsDateReformat.parse(input)
        def fmt(withTime: Boolean) = got.map { z =>
          val m = if (z.getMonthValue <= 9) f"0${z.getMonthValue}%d" else z.getMonthValue.toString
          if (withTime) s"${z.getYear}-$m-${z.getDayOfMonth}T${z.getHour}:${z.getMinute}:${z.getSecond}"
          else s"${z.getYear}-$m-${z.getDayOfMonth}"
        }.getOrElse("N")
        if (fmt(false) != ed || fmt(true) != edt) {
          bad += 1
          println(s"MISMATCH seed=$seed '$input': mirror (${fmt(false)}, ${fmt(true)}), node ($ed, $edt)")
        }
      }
    }
    bad
  }
}
