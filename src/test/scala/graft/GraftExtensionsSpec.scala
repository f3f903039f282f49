package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface parity for the native expressions. The config-based
  * registration path (`--conf spark.sql.extensions=graft.GraftExtensions`)
  * only applies at session construction and is covered by the spark-shell
  * drive in the verify recipe; here the same expression builders are
  * installed into the shared session's registry and exercised via
  * spark.sql. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("native expressions answer identically through SQL and Column APIs") {
    val s = SparkSpec.spark
    import s.implicits._
    // install the REAL builders from GraftExtensions.functions — the
    // same (name, builder) pairs the config-based extension path
    // injects, so a wrong name/arity/argument-order there fails here
    new GraftExtensions().functions.foreach { case (ident, _, builder) =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }

    val viaCol = Seq("a b c").toDF("t")
      .select(graft.functions.SimHash64($"t")).as[Long].head()
    val viaSql = s.sql("SELECT simhash64('a b c')").as[Long].head()
    assert(viaCol == viaSql)

    val cos = s.sql(
      "SELECT cosine_similarity(array(float(1), float(0)), array(float(1), float(0)))")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)

    val parsed = s.sql(
      """SELECT parse_ntriple('<http://s> <http://p> "v" .').obj.value""")
      .as[String].head()
    assert(parsed == "v")

    val shingleSql = s.sql("SELECT shingle_hashes('a b c d')").as[Seq[Long]].head()
    val shingleCol = Seq("a b c d").toDF("t")
      .select(graft.functions.ShingleHashes($"t")).as[Seq[Long]].head()
    assert(shingleSql == shingleCol && shingleSql.length == 2)

    val winnowSql = s.sql("SELECT winnow_fingerprint('abcdefghij')").as[Seq[Long]].head()
    val winnowCol = Seq("abcdefghij").toDF("t")
      .select(graft.functions.Winnow($"t")).as[Seq[Long]].head()
    assert(winnowSql == winnowCol && winnowSql.nonEmpty)

    import org.apache.spark.sql.functions.{col, xxhash64}
    val bytes = graft.functions.BloomSupport.toBytes(
      Seq("seen text").toDF("text")
        .select(xxhash64(col("text")).as("fp")).stat.bloomFilter("fp", 100, 0.01))
    s.sql("SELECT 'seen text' AS t UNION ALL SELECT 'novel text'")
      .createOrReplaceTempView("probe")
    val hits = s.sql(
      s"SELECT t FROM probe WHERE bloom_might_contain(${
        bytes.map(b => f"$b%02x").mkString("X'", "", "'")}, xxhash64(t))")
      .as[String].collect()
    assert(hits.toSeq == Seq("seen text"), hits.toSeq)

    val jsDate = s.sql("SELECT js_date_reformat('2023/05/04')").as[String].head()
    assert(jsDate == "2023-05-4")
    val jsDateTime = s.sql(
      "SELECT js_datetime_reformat('Sat May 4 10:20:30 2023')").as[String].head()
    assert(jsDateTime == "2023-05-4T10:20:30")
    val jsInvalid = s.sql("SELECT js_date_reformat('13-01-02')").head()
    assert(jsInvalid.isNullAt(0))
  }

  test("cosine_similarity keeps double-array precision (no float narrowing)") {
    val s = SparkSpec.spark
    import s.implicits._
    new GraftExtensions().functions.foreach { case (ident, _, builder) =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
    // dot = (2^24+1)·1 + 1·(−2^24) = 1 in double; a float-narrowed left
    // side rounds 2^24+1 to 2^24 and the dot collapses to 0
    val sim = s.sql("SELECT cosine_similarity(array(16777217.0D, 1.0D), " +
      "array(1.0D, -16777216.0D))").as[Double].head()
    assert(sim > 0.0, s"double input must not be narrowed to float (got $sim)")
    // per-side element width: float left, double right
    val one = s.sql("SELECT cosine_similarity(array(float(3), float(4)), " +
      "array(3.0D, 4.0D))").as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("cosine_similarity null semantics: NULL arg and null array element") {
    val s = SparkSpec.spark
    import s.implicits._
    new GraftExtensions().functions.foreach { case (ident, _, builder) =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
    // a NULL literal must pass analysis (NullType accepted) and return
    // null, SQL-style — not throw a TypeCheckFailure
    val nullArg = s.sql(
      "SELECT cosine_similarity(NULL, array(1.0D, 2.0D))")
      .as[Option[Double]].head()
    assert(nullArg.isEmpty, s"NULL arg must yield null, got $nullArg")
    // a null ELEMENT (containsNull=true input) must yield null — the
    // unsafe getters would otherwise read the null slot as garbage/0.0
    // and silently skew the similarity
    val nullElem = s.sql(
      "SELECT cosine_similarity(array(1.0D, CAST(NULL AS DOUBLE)), " +
        "array(1.0D, 2.0D))").as[Option[Double]].head()
    assert(nullElem.isEmpty, s"null element must yield null, got $nullElem")
    // and on the other side, via the Column API
    val df = Seq((Array(1.0, 2.0), Array[java.lang.Double](1.0, null)))
      .toDF("a", "b")
    val viaCol = df.select(graft.functions.CosineSimilarity(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).as[Option[Double]].head()
    assert(viaCol.isEmpty, s"null element (right side) must yield null, got $viaCol")
    // non-null inputs through the SAME containsNull=true-typed path are
    // unaffected
    val ok = s.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D), array(1.0D, 2.0D))")
      .as[Double].head()
    assert(math.abs(ok - 1.0) < 1e-12)
  }
}
