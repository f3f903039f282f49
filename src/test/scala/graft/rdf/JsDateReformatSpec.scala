package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential conformance corpus for the JS `new Date` emulation behind
  * the repair stage (fixTriple.js:148-162, 197-214). Every expectation
  * below is GROUND TRUTH captured by running the input through node v20
  * under TZ=UTC and formatting with the reference's own field logic
  * (month padded iff getMonth() < 9, nothing else padded) — not derived
  * from this implementation. A row is (input, fixDate output,
  * fixDateTime output), null = Invalid Date.
  *
  * Residuals the corpus deliberately leaves out (documented in
  * JsDateReformat): 1-2-digit-leading numeric forms flip V8 into
  * month-first parsing ("99-01-01" → 1999-01-1, "9-01-01" → 2001-09-1)
  * and RFC-1123 "GMT" suffixes — neither appears in harvested data.
  */
class JsDateReformatSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(String, String, String)] = Seq(
    // (input, date, dateTime) — null = Invalid Date in node v20 @ TZ=UTC
    ("2023-05-04", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023-5-4", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023/05/04", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023.05.04", "2023-05-4", "2023-05-4T0:0:0"),
    ("May 4 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("May 4, 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("may 4 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("MAY 4 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("Sept 4 2023", "2023-09-4", "2023-09-4T0:0:0"),
    ("September 4 2023", "2023-09-4", "2023-09-4T0:0:0"),
    ("4 May 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("4 May, 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("Sat May 4 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("Saturday, May 4 2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023", "2023-01-1", "2023-01-1T0:0:0"),
    ("2023-05", "2023-05-1", "2023-05-1T0:0:0"),
    ("2023/05", "2023-05-1", "2023-05-1T0:0:0"),
    ("05/04/2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("5/4/2023", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023-05-04T10:20:30", "2023-05-4", "2023-05-4T10:20:30"),
    ("2023-05-04 10:20:30", "2023-05-4", "2023-05-4T10:20:30"),
    ("2023-05-04T10:20:30.123", "2023-05-4", "2023-05-4T10:20:30"),
    ("2023-05-04T10:20:30Z", "2023-05-4", "2023-05-4T10:20:30"),
    ("2023-05-04T10:20:30+02:00", "2023-05-4", "2023-05-4T8:20:30"),
    ("2023-05-04T10:20:30+0200", "2023-05-4", "2023-05-4T8:20:30"),
    ("2023-05-04T10:20", "2023-05-4", "2023-05-4T10:20:0"),
    // day overflow ROLLS (within the syntactic 1-31 window)...
    ("2023-02-30", "2023-03-2", "2023-03-2T0:0:0"),
    ("2023-11-31", "2023-12-1", "2023-12-1T0:0:0"),
    // ...but month 13+, day 32+, hour 25+ are Invalid Date
    ("2023-13-01", null, null),
    ("2023-1-40", null, null),
    ("May 32 2023", null, null),
    ("2023-05-04T24:30", null, null),
    // hour 24 with :00 rolls to the next day
    ("2023-1-1 24:00", "2023-01-2", "2023-01-2T0:0:0"),
    ("2023-1-1 24:00:00", "2023-01-2", "2023-01-2T0:0:0"),
    ("May 4 2023 10:20:30", "2023-05-4", "2023-05-4T10:20:30"),
    ("4 May 2023 10:20", "2023-05-4", "2023-05-4T10:20:0"),
    ("05/04/2023 10:20:30", "2023-05-4", "2023-05-4T10:20:30"),
    // year widths: 3-6 digits year-first, zero-padded fields tolerated
    ("999-01-01", "999-01-1", "999-01-1T0:0:0"),
    ("12023-01-01", "12023-01-1", "12023-01-1T0:0:0"),
    ("0000-01-01", "0-01-1", "0-01-1T0:0:0"),
    ("2023-005-04", "2023-05-4", "2023-05-4T0:0:0"),
    ("2023-123-04", null, null),
    // the Date range boundary: ±1e8 days from the epoch
    ("275760-01-01", "275760-01-1", "275760-01-1T0:0:0"),
    ("275761-01-01", null, null),
    ("  2023-05-04  ", "2023-05-4", "2023-05-4T0:0:0"),
    ("junk", null, null),
    ("", null, null))

  test("fixDate/fixDateTime agree with node v20 on the differential corpus") {
    val df = corpus.map(_._1).toDF("v")
      .select($"v", JsDateReformat.date($"v").as("d"),
        JsDateReformat.dateTime($"v").as("dt"))
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    corpus.foreach { case (in, d, dt) =>
      assert(got(in) == ((d, dt)),
        s"input '$in': got ${got(in)}, node says ($d, $dt)")
    }
  }
}
