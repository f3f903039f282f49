package graft.ops

import graft.rdf.Vocab
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P2 binding projection (reference lib/utils.js:7-25): SPARQL result
  * bindings arrive as string terms tagged with a datatype; consumers get
  * typed rows. The reference coerces exactly three ways —
  * `xsd:integer` → parseInt, `xsd:dateTime` → Date, anything else →
  * string — which here is a per-column `cast` driven by a datatype map.
  */
object Bindings {

  /** Coerce string-valued binding columns to their declared datatypes.
    * `datatypes` maps column name → datatype IRI. Unknown datatypes stay
    * strings (utils.js:20-21); unparseable values become null (the
    * reference's parseInt/Date would yield NaN/Invalid Date). */
  def typed(bindings: DataFrame, datatypes: Map[String, String]): DataFrame =
    datatypes.foldLeft(bindings) { case (df, (name, dt)) =>
      dt match {
        // parseInt semantics (utils.js:16): take the leading optional-sign
        // digit prefix, ignore the rest ("1.5" → 1, "12abc" → 12, "abc" →
        // null). Extract-then-cast also avoids decimal HALF_UP rounding
        // fabricating values, and ANSI-safe try_cast nulls the no-match
        // empty string. decimal(38,0) because xsd:integer is unbounded.
        case Vocab.xsdInteger =>
          df.withColumn(name,
            regexp_extract(col(name), "^\\s*([+-]?\\d+)", 1).try_cast(
              org.apache.spark.sql.types.DecimalType(38, 0)))
        case Vocab.xsdDateTime =>
          df.withColumn(name, try_to_timestamp(col(name)))
        case _ => df
      }
    }
}
