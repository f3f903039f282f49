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
    * reference's parseInt/Date would yield NaN/Invalid Date). Mapping
    * note: the reference's coercion guard (`&& row[key].value`,
    * utils.js:16-19) is falsy for an EMPTY binding, which therefore
    * skips parseInt/Date and stays the raw `""` string in its
    * dynamically-typed row; a typed decimal/timestamp column cannot
    * hold `""`, so the engine renders that same "not coerced" outcome
    * as null — the one representable equivalent. */
  def typed(bindings: DataFrame, datatypes: Map[String, String]): DataFrame =
    datatypes.foldLeft(bindings) { case (df, (name, dt)) =>
      dt match {
        // parseInt semantics (utils.js:16), pinned by the generated node
        // corpus in JsNumberMirrorSpec: take the leading optional-sign
        // digit prefix, ignore the rest ("1.5" → 1, "12abc" → 12,
        // "1e3" → 1, "abc" → null) — EXCEPT a `[+-]?0[xX]` prefix flips
        // radix-16 ("0x10" → 16, "-0X1f" → -31, "0x"/"0xzz" → null; no
        // octal: "08" → 8). Documented residual (machine-checked): JS
        // parseInt returns a double, so values beyond 2^53 round
        // ("9007199254740993" → ...92, "0xffffffffffffffff" → 2^64)
        // while this mirror keeps exact decimals — the exact value is
        // strictly more faithful to the binding — and a hex literal
        // wider than 64 bits (17+ significant hex digits, already deep
        // inside the rounding residual) nulls instead: `conv` works in
        // 64-bit arithmetic and ANSI mode makes its overflow THROW, so
        // the length guard below is what keeps one hostile binding from
        // killing the whole query (found by JsNumberSoupSweep).
        // Extract-then-cast also avoids decimal HALF_UP rounding
        // fabricating values, and ANSI-safe try_cast nulls the no-match
        // empty string. decimal(38,0) because xsd:integer is unbounded.
        case Vocab.xsdInteger =>
          val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
          // JS trims the full ES whitespace set (NBSP/BOM/Zs — node
          // probe: parseInt(" 12") is 12), not just Java \s
          val ws = graft.rdf.Validation.jsWhitespace + "*"
          // the 0x prefix COMMITS parseInt to radix 16: "0x" with no hex
          // digits is NaN, never "0" from the decimal fallback
          val hexPrefix = col(name).rlike("^" + ws + "[+-]?0[xX]")
          val hexDigits = regexp_extract(col(name),
            "^" + ws + "[+-]?0[xX]([0-9a-fA-F]+)", 1)
          val hexNeg = regexp_extract(col(name),
            "^" + ws + "(-)0[xX]", 1) === "-"
          // significant digits only: "0x00000000000000000000ff" is 255
          val hexSig = regexp_replace(hexDigits, "^0+(?=.)", "")
          val hexVal = when(length(hexSig) <= lit(16),
            conv(hexSig, 16, 10).try_cast(dec38)).otherwise(lit(null).cast(dec38))
          df.withColumn(name,
            when(hexPrefix,
              when(hexDigits =!= "",
                when(hexNeg, hexVal * -1).otherwise(hexVal))
                .otherwise(lit(null).cast(dec38)))
              .otherwise(regexp_extract(col(name), "^" + ws + "([+-]?\\d+)", 1)
                .try_cast(dec38)))
        case Vocab.xsdDateTime =>
          df.withColumn(name, try_to_timestamp(col(name)))
        case _ => df
      }
    }
}
