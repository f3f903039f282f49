package graft.rdf

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev harness: diff [[JsDateReformat.parse]] against the committed node
  * corpus without a Spark session — `sbt "Test/runMain graft.rdf.JsDateCorpusDiff"`.
  * Prints every mismatching row (input, mirror, node) and a summary line. */
object JsDateCorpusDiff {
  def main(args: Array[String]): Unit = {
    val lines = Files.readAllLines(
      Paths.get("src/test/resources/jsdate/corpus.tsv"), StandardCharsets.UTF_8)
    import scala.jdk.CollectionConverters._
    var bad = 0
    var n = 0
    lines.asScala.filter(_.nonEmpty).foreach { line =>
      val Array(inRaw, d, dt) = line.split("\t", -1)
      // same escape set the probe writes: \\ \t \n \uXXXX
      val in = {
        val b = new StringBuilder
        var i = 0
        while (i < inRaw.length) {
          if (inRaw.charAt(i) == '\\' && i + 1 < inRaw.length) {
            inRaw.charAt(i + 1) match {
              case 't' => b += '\t'; i += 2
              case 'n' => b += '\n'; i += 2
              case 'u' =>
                b += Integer.parseInt(inRaw.substring(i + 2, i + 6), 16).toChar
                i += 6
              case c => b += c; i += 2
            }
          } else { b += inRaw.charAt(i); i += 1 }
        }
        b.toString
      }
      val expD = if (d == "\\N") null else d
      val expDt = if (dt == "\\N") null else dt
      val got = JsDateReformat.parse(in)
      val gd = got.map { z =>
        val m = if (z.getMonthValue <= 9) f"0${z.getMonthValue}%d" else z.getMonthValue.toString
        s"${z.getYear}-$m-${z.getDayOfMonth}"
      }.orNull
      val gdt = got.map { z =>
        val m = if (z.getMonthValue <= 9) f"0${z.getMonthValue}%d" else z.getMonthValue.toString
        s"${z.getYear}-$m-${z.getDayOfMonth}T${z.getHour}:${z.getMinute}:${z.getSecond}"
      }.orNull
      n += 1
      if (gd != expD || gdt != expDt) {
        bad += 1
        println(s"MISMATCH '$in': mirror=($gd, $gdt) node=($expD, $expDt)")
      }
    }
    println(s"$bad mismatches / $n rows")
    if (bad > 0) sys.exit(1)
  }
}
