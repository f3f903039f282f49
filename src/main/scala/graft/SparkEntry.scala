package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (key prefix = the
  * SURVEY operator ID); `oracleSql` holds the equivalent DuckDB SQL the
  * driver runs over the same parquet for the hash-match correctness gate.
  * Column names/types and row order are aligned on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> ((s, d) => Relational.q1Agg(s, d)),
    "s4_point_lookup"   -> ((s, d) => Relational.pointLookup(s, d)),
    "s8_first_file"     -> ((s, d) => Relational.firstLineOfOrder(s, d)),
    "s10_exists_probe"  -> ((s, d) => Relational.existsProbe(s, d)),
    "p1_delta_filter"   -> ((s, d) => Relational.deltaInsertFilter(s, d)),
    "p7_in_filter"      -> ((s, d) => Relational.inListFilter(s, d)),
    "j1_chain_join"     -> ((s, d) => Relational.chainJoin(s, d)),
    "j2_star_join"      -> ((s, d) => Relational.starJoin(s, d)),
    "j5_recovery_update" -> ((s, d) => Relational.recoveryUpdateSet(s, d)),
    "a1_count_distinct" -> ((s, d) => Relational.countDistinctPages(s, d)),
    "a2_size_stats"     -> ((s, d) => Relational.sizeStats(s, d)),
    "d1_distinct"       -> ((s, d) => Relational.distinctPriorities(s, d)),
    "o1_order_limit_offset" -> ((s, d) => Relational.orderLimitOffset(s, d)),
    "t_star_pivot"      -> ((s, d) => QuadOps.starPivot(s, d)),
    "t_chain_join"      -> ((s, d) => QuadOps.chainTraversal(s, d)),
    "p4_validate"       -> ((s, d) => QuadOps.validateCorpus(s, d)),
    "a3_verdict_counts" -> ((s, d) => QuadOps.verdictCounts(s, d)),
  )

  /** Shared quad-table CTE for the t_* oracles. */
  private val geoQuadsCte: String =
    """WITH quads AS (
      |  SELECT 'urn:nation:' || n_nationkey AS subject, 'urn:p:name' AS predicate, n_name AS obj FROM nation
      |  UNION ALL
      |  SELECT 'urn:nation:' || n_nationkey, 'urn:p:region', 'urn:region:' || n_regionkey FROM nation
      |  UNION ALL
      |  SELECT 'urn:region:' || r_regionkey, 'urn:p:name', r_name FROM region)""".stripMargin

  /** Validator-corpus CTE (must mirror QuadOps.validationCorpus exactly). */
  private val corpusCte: String =
    """WITH corpus AS (
      |  SELECT doc_id, doc_id % 7 AS idx, doc_id % 3 AS s3, doc_id % 2 AS s2,
      |         text, n_chars FROM documents),
      |tagged AS (
      |  SELECT doc_id,
      |    CASE WHEN idx = 0 THEN 'none'
      |         WHEN idx = 1 THEN 'http://www.w3.org/2001/XMLSchema#string'
      |         WHEN idx = 2 THEN 'http://www.w3.org/2001/XMLSchema#boolean'
      |         WHEN idx = 3 THEN 'http://www.w3.org/2001/XMLSchema#date'
      |         WHEN idx = 4 THEN 'http://www.w3.org/2001/XMLSchema#integer'
      |         WHEN idx = 5 THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral'
      |         ELSE 'http://www.opengis.net/ont/geosparql#wktLiteral' END AS datatype,
      |    CASE WHEN idx = 0 THEN 'urn:doc:' || doc_id
      |         WHEN idx = 1 THEN substr(text, 1, 20)
      |         WHEN idx = 2 THEN (CASE WHEN s3 = 0 THEN 'true' WHEN s3 = 1 THEN 'TRUE' ELSE 'yes' END)
      |         WHEN idx = 3 THEN (CASE WHEN s2 = 0 THEN '2023-05-04' ELSE '2023/05/04' END)
      |         WHEN idx = 4 THEN (CASE WHEN s3 = 0 THEN CAST(n_chars AS VARCHAR) WHEN s3 = 1 THEN '4.5e2' ELSE 'abc' END)
      |         WHEN idx = 5 THEN '<x/>'
      |         ELSE (CASE WHEN s2 = 0 THEN '<http://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)'
      |                    ELSE '<https://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)' END) END AS value,
      |    CASE WHEN idx = 2 THEN (CASE WHEN s3 = 0 THEN 'valid' WHEN s3 = 1 THEN 'corrected' ELSE 'invalid' END)
      |         WHEN idx = 3 THEN (CASE WHEN s2 = 0 THEN 'valid' ELSE 'corrected' END)
      |         WHEN idx = 4 THEN (CASE WHEN s3 = 2 THEN 'invalid' ELSE 'valid' END)
      |         WHEN idx = 5 THEN 'corrected'
      |         WHEN idx = 6 THEN (CASE WHEN s2 = 0 THEN 'valid' ELSE 'corrected' END)
      |         ELSE 'valid' END AS verdict
      |  FROM corpus)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(avg(l_quantity), 2) AS avg_qty, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s4_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date, o_orderpriority
        |FROM orders WHERE o_orderkey = 1""".stripMargin,
    "s8_first_file" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey = 1 ORDER BY l_linenumber LIMIT 1""".stripMargin,
    "s10_exists_probe" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "p1_delta_filter" ->
      """WITH g AS (
        |  SELECT user_id, list(struct_pack(event_id := event_id, event_type := event_type)
        |                       ORDER BY event_id, event_type) AS inserts
        |  FROM events GROUP BY user_id),
        |x AS (SELECT user_id, unnest(inserts) AS ins FROM g)
        |SELECT user_id, ins.event_id AS event_id FROM x
        |WHERE ins.event_type = 'signup' ORDER BY event_id""".stripMargin,
    "p7_in_filter" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "j1_chain_join" ->
      """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "j2_star_join" ->
      """SELECT c_custkey, c_name, n_name, r_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey""".stripMargin,
    "j5_recovery_update" ->
      """SELECT o_orderkey, o_orderstatus AS old_status, 'failed' AS new_status
        |FROM orders WHERE o_orderstatus = 'O'
        |AND o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "a1_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a2_size_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |round(avg(length(text)), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "d1_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "o1_order_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000 OFFSET 500""".stripMargin,
    "t_star_pivot" -> (geoQuadsCte +
      """
        |SELECT subject, max(CASE WHEN predicate = 'urn:p:name' THEN obj END) AS name,
        |       max(CASE WHEN predicate = 'urn:p:region' THEN obj END) AS region
        |FROM quads GROUP BY subject ORDER BY subject""".stripMargin),
    "t_chain_join" -> (geoQuadsCte +
      """
        |SELECT nn.obj AS nation_name, rn.obj AS region_name
        |FROM quads l
        |JOIN quads nn ON nn.subject = l.subject AND nn.predicate = 'urn:p:name'
        |JOIN quads rn ON rn.subject = l.obj AND rn.predicate = 'urn:p:name'
        |WHERE l.predicate = 'urn:p:region' ORDER BY nation_name""".stripMargin),
    "p4_validate" -> (corpusCte +
      """
        |SELECT doc_id, datatype, value, verdict FROM tagged ORDER BY doc_id""".stripMargin),
    "a3_verdict_counts" -> (corpusCte +
      """
        |SELECT verdict, count(*) AS n FROM tagged GROUP BY verdict ORDER BY verdict""".stripMargin),
  )
}
