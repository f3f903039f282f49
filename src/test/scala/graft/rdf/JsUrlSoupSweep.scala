package graft.rdf

import scala.sys.process._

import org.apache.spark.unsafe.types.UTF8String

/** Dev harness: multi-seed differential sweep of the `new URL` throw
  * mirror against node — `sbt "Test/runMain graft.rdf.JsUrlSoupSweep
  * [nSeeds]"`. The spec's live fuzz runs one fixed seed; this walks
  * many, with extra weight on the r17 IDNA arm (ACE labels, raw
  * non-ASCII including RTL/AN codepoints for the bidi criterion,
  * percent-escaped UTF-8). Exit 1 on any mismatch. */
object JsUrlSoupSweep {
  def main(args: Array[String]): Unit = {
    val nSeeds = if (args.nonEmpty) args(0).toInt else 10
    val bad = sweep(1 to nSeeds)
    println(s"$bad mismatches across $nSeeds seeds")
    if (bad > 0) sys.exit(1)
  }

  /** One sweep over the given seeds; returns the mismatch count (each
    * printed). Callable from main (dev) and SoupSweepSmokeSpec (CI). */
  def sweep(seeds: Seq[Int]): Int = {
    // label fragments: ASCII shapes, punycode edges, and raw codepoints
    // across the UTS46 table's interesting classes (mapped, deviation,
    // disallowed, ignored) plus bidi classes L/R/AL/EN/AN/NSM
    val frags = Seq("a", "ex-1", "xn--", "xn--a", "xn--tda", "xn--caf-dma",
      "xn--caf-dma-", "xn--123", "xn--zzz", "xn----", "XN--TDA", "xn--1ug",
      "xn--a-ecp", "xn--ls8h", "café", "ß", "‍", "­",
      "א", "ב", "ا", "١", "́", "é", "1",
      "255", "0x10", "%C3%A9", "%c3%a9", "%e2%80%8d", "%41", "%zz", "%",
      "ド", "中", "Ａ", "≠", "_", "~", "-", "--", "a-",
      "-a", "ς", "ẞ")
    val seps = Seq(".", ".", ".", "", "%2e", "。")
    val tails = Seq("", "/", ":80/", "?q", "#f")
    var bad = 0
    for (seed <- seeds) {
      val rnd = new scala.util.Random(770000 + seed)
      val fuzz = (0 until 500).map { _ =>
        val n = 1 + rnd.nextInt(4)
        val host = (0 until n).map { _ =>
          (0 until (1 + rnd.nextInt(3)))
            .map(_ => frags(rnd.nextInt(frags.size))).mkString
        }.mkString(seps(rnd.nextInt(seps.size)))
        s"http://$host${tails(rnd.nextInt(tails.size))}"
      }.distinct
      val js = "const us=JSON.parse(require('fs').readFileSync(0,'utf8'));" +
        "for(const u of us){let r='throw';try{new URL(u);r='ok'}catch(e){};console.log(r)}"
      val in = new java.io.ByteArrayInputStream(
        fuzz.map(u => "\"" + u.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
          .mkString("[", ",", "]").getBytes("UTF-8"))
      val out = new StringBuilder
      val code = (Process(Seq("node", "-e", js)) #< in)
        .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      require(code == 0, "node oracle failed")
      val nodeOk = out.toString.split("\n").map(_ == "ok")
      require(nodeOk.length == fuzz.size, s"oracle line count ${nodeOk.length} != ${fuzz.size}")
      fuzz.zip(nodeOk).foreach { case (u, ok) =>
        val got = JsUrlMirror.isParseable(UTF8String.fromString(u))
        if (got != ok) {
          bad += 1
          println(s"MISMATCH seed=$seed '$u' (${u.map(c => f"${c.toInt}%04x").mkString(",")}): mirror $got, node $ok")
        }
      }
    }
    bad
  }
}
