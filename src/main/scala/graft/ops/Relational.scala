package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's relational query shapes (SURVEY §2.1-§2.7), re-expressed
  * as DataFrame plans over the driver's TPC-H-ish tables.
  *
  * Every SPARQL round-trip the reference ships to Virtuoso becomes a
  * declarative Spark plan here; the shapes (point lookup, link scan,
  * EXISTS probe, chain/star join, countDistinct, distinct, order/limit)
  * are one-to-one with the SURVEY operator IDs cited per method.
  *
  * Scale notes, since these run verbatim at 100 TB:
  *   - dimension sides (nation, region, customer at small SF; the
  *     single-task side of every reference join) are broadcast — no
  *     shuffle of the fact table for J1/J2;
  *   - point lookups (S4/S8) are pushed-down parquet filters, not scans;
  *   - aggregates are partial+final hash aggregation (map-side combine)
  *     by construction — nothing here materializes on the driver.
  */
object Relational {

  /** S4 task-lookup scan: SELECT by bound subject URI → pushed-down point
    * filter (reference lib/task.js:80-108). */
  def pointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === 1L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date"),
        col("o_orderpriority"))

  /** S8 physical-file lookup, LIMIT 1 (lib/file-helpers.js:20-38) — made
    * deterministic with an explicit sort key. */
  def firstLineOfOrder(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") === 1L)
      .orderBy(col("l_linenumber"))
      .limit(1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))

  /** S10 is-task EXISTS probe (lib/task.js:65-78) → left-semi join. */
  def existsProbe(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** P1 delta insert-filter (lib/delta.js:9-17): changesets are arrays of
    * triples; flatten (explode) → filter on predicate/object analogue →
    * project subject analogue. Rebuilt here as array-of-struct per user,
    * then exploded — the same explode+filter+project plan the streaming
    * ingest uses. `sort_array` keeps the array construction deterministic
    * (collect_list order is partition-dependent). */
  def deltaInsertFilter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("event_type"))))
        .as("inserts"))
      .select(col("user_id"), explode(col("inserts")).as("ins"))
      .filter(col("ins.event_type") === "signup")
      .select(col("user_id"), col("ins.event_id").as("event_id"))
      .orderBy(col("event_id"))

  /** P7 operation VALUES filter (lib/task.js:47-50) → `isin`. */
  def inListFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** J1 2-hop chain join (lib/pipeline-import.js:131-139):
    * task→container→file becomes customer→orders→lineitem. The orders ⋈
    * lineitem equi-join shuffles on the shared key; the customer dimension
    * is broadcast. Top-10 with a total tiebreak for determinism. */
  def chainJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rev")).as("rev"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), round(col("rev"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** J2 star join (lib/task.js:83-99): one row per entity with its
    * dimension attributes; nation/region broadcast. */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("c_custkey"))
  }

  /** J5/K7 startup-recovery bulk update shape (lib/task.js:24-63): all
    * "busy" rows of the watched operations → new status. Emitted as the
    * would-be-updated row set (the MERGE source). */
  def recoveryUpdateSet(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderstatus").as("old_status"),
        lit("failed").as("new_status"))
      .orderBy(col("o_orderkey"))

  /** A1 COUNT(DISTINCT) over the chain (lib/pipeline-import.js:158-178).
    * Exact here for oracle parity; `approx_count_distinct` is the 100 TB
    * variant (SURVEY §7.4). */
  def countDistinctPages(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** A2 file-size stats (lib/file-helpers.js:104-105) over documents. */
  def sizeStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        round(avg(length(col("text"))), 2).as("avg_chars"))
      .orderBy(col("lang"))

  /** D1/D4 DISTINCT (lib/pipeline-import.js:132). */
  def distinctPriorities(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** O1 ORDER BY + LIMIT/OFFSET pagination window
    * (lib/pipeline-import.js:126-150). */
  def orderLimitOffset(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(500)
      .limit(1000)

  /** Top-N-per-group (window ranking): the reference's per-task "latest
    * page" style lookups generalized — one shuffle on the partition key,
    * rank inside the partition. */
  def topOrdersPerCustomer(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** NOT EXISTS anti-join: subjects with no matching link — the inverse
    * of the S10 probe (left_anti). Filtered to urgent orders so the
    * result set is non-trivial at every scale factor. */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP aggregation: per-group + subtotal + grand-total rows in one
    * pass (partial aggregation covers all grouping sets). */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Headline scan-heavy aggregate (TPC-H Q1 shape): partial+final hash
    * agg over one pushed-down-filtered lineitem scan. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
