package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Agg => Agg0}
import graft.functions.Agg._
import graft.sources.Tables

/** The TPC-H-shaped slice of the relational core (SURVEY §2.3),
  * split out of [[Relational]] along the benchmark-query sub-family
  * (pure file organization — registry keys, semantics and oracles are
  * unchanged; KeyCheckSpec guards the registry through the move).
  * Shared scale conventions are documented on [[Relational]]: dims
  * broadcast, facts shuffle once on the join key, aggregates partial
  * map-side, every oracle carries identical aliases + a total ORDER
  * BY.
  */
object RelationalTpch {

  private val cutoff = "2001-09-02 00:00:00"

  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit(cutoff).cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$cutoff'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(s, dir)
      .filter($"o_orderdate" < lit("1998-03-15 00:00:00").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1998-03-15 00:00:00").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING'
       |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  def q5RegionVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust   = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01 00:00:00").cast("timestamp"))
    val li   = Tables.lineitem(s, dir)
    val supp = Tables.supplier(s, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** §2.3 — customer-order-count distribution (the TPC-H Q13 shape):
    * how many customers placed 0, 1, 2, … orders. Two stacked
    * aggregations with a LEFT join in between — the one classic shape
    * the suite lacked: the outer groupBy's key is the INNER
    * aggregate's value. Zero-order customers must survive (left
    * join + count of a nullable key), which is why this can't be a
    * plain orders rollup. Scale: join + first groupBy shuffle on
    * custkey (uniform); the second groupBy's key space is tiny
    * (max orders per customer) — heavy skew by construction, absorbed
    * entirely by map-side partial aggregation (each task emits ≤
    * |distinct counts| rows), never a hot reducer. */
  def qCustdist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val qCustdistSql: String =
    s"""SELECT c_count, count(*) AS custdist
       |FROM (
       |  SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |  GROUP BY c_custkey)
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Quantity threshold for [[qBigOrders]] — ~0.3% of orders qualify
    * at every SF (the Q18 selectivity shape). */
  private val bigOrderQty = 300.0

  /** §2.3 — large-volume orders (TPC-H Q18 shape): orders whose total
    * line quantity exceeds [[bigOrderQty]], with customer context.
    * The HAVING runs as a partial-agged groupBy on the FACT table
    * before any join: lineitem collapses map-side to per-order sums,
    * the filter kills ~99.7% of keys, and only qualifying orders
    * touch the orders⋈customer side — the aggregate predicate prunes
    * the join input rather than filtering its output. At 100 TB the
    * qualifying set is small enough that AQE converts the orders join
    * probe to broadcast at runtime. Ref: the reference's batch
    * roll-up surface (lib.ts getBatchStatus aggregates) has no Q18
    * analog; this row is part of the §2.3 relational core. */
  def qBigOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > bigOrderQty)
    Tables.orders(s, dir)
      .join(qty, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val qBigOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM orders
       |JOIN (
       |  SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING ${dsumSql("l_quantity")} > $bigOrderQty
       |) ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  /** TPC-H Q14 shape — promo revenue share per ship-month: one
    * broadcast dim join (part is the small side at every SF — parts
    * grow ~1/7th of lineitem), conditional partial-agged sums, a
    * row-local ratio. No shuffle ever carries lineitem: the only
    * exchange is the month-count-sized aggregate. The share divides
    * two exact quantized-long sums, so the ratio is bit-stable
    * cross-engine. */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promo = $"p_type".startsWith("PROMO")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .withColumn("month", date_trunc("month", $"l_shipdate"))
      .withColumn("rev_q", quantize($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).cast("long"))
      .groupBy($"month")
      .agg(
        (sum(when(promo, $"rev_q").otherwise(0L)).cast("double") / lit(10000.0)).as("promo_revenue"),
        (sum($"rev_q").cast("double") / lit(10000.0)).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_share",
        expr(Agg0.rndSql("100.0 * promo_revenue / total_revenue", 6)))
      .select($"month", $"promo_revenue", $"total_revenue", $"n_items", $"promo_share")
      .orderBy($"month")
  }

  val q14PromoRevenueSql: String =
    s"""WITH q AS (
       |  SELECT date_trunc('month', l_shipdate) AS month,
       |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0
       |         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev_q,
       |    p_type LIKE 'PROMO%' AS is_promo
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |), m AS (
       |  SELECT month,
       |    CAST(sum(CASE WHEN is_promo THEN rev_q ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
       |    CAST(sum(rev_q) AS DOUBLE) / 10000.0 AS total_revenue,
       |    count(*) AS n_items
       |  FROM q GROUP BY month
       |)
       |SELECT month, promo_revenue, total_revenue, n_items,
       |  ${Agg0.rndSql("100.0 * promo_revenue / total_revenue", 6)} AS promo_share
       |FROM m ORDER BY month""".stripMargin

  /** TPC-H Q4 shape — order-priority counts over orders with at least
    * one LATE lineitem (shipped >90 days after the order date). The
    * EXISTS is a left-semi join on the orderkey equi-pair with the
    * lateness comparison as a residual condition — the semi join
    * short-circuits per order (no distinct, no count of the lineitem
    * side) and the output is the priority-count-sized aggregate. */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val late = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
    Tables.orders(s, dir)
      .join(late,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val q4LateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q10 shape — top returned-item customers for one quarter
    * (reference query surface: lib.ts:736-1132 drives exactly this
    * "rank accounts by problem volume" iteration). Join order is the
    * 100 TB-friendly one: lineitem is pre-filtered to `l_returnflag =
    * 'R'` AT THE SCAN (pushed filter), orders is pre-filtered to the
    * quarter, and their join shuffles only the two filtered slivers on
    * orderkey; customer then joins on the already-aggregated per-
    * customer revenue (customer-count-sized, NOT lineitem-sized), and
    * nation is broadcast. Final top-20 is TakeOrderedAndProject — a
    * per-partition bounded heap + driver merge, never a global sort. */
  def q10ReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordersQ = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val returned = Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val perCust = returned
      .join(ordersQ, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    perCust
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name", $"c_acctbal", $"revenue")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10ReturnedRevenueSql: String =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1996-04-01'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** TPC-H Q7 shape — bilateral trade volume between customer and
    * supplier nations by ship year. The two nation joins are broadcast
    * (25-row dim, twice); supplier is broadcast (small per scale
    * factor relative to facts); the only real shuffle is
    * lineitem⋈orders on orderkey followed by the per-(nation,nation,
    * year) aggregate, which partial-aggregates map-side down to a
    * |nations|²·|years| result — tiny at any corpus size. */
  def q7NationTrade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nationS = Tables.nation(s, dir).select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val nationC = Tables.nation(s, dir).select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(s, dir).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(nationS), $"s_nationkey" === $"sn_key")
      .join(broadcast(nationC), $"c_nationkey" === $"cn_key")
      .filter($"supp_nation" =!= $"cust_nation")
      .withColumn("ship_year", year($"l_shipdate"))
      .groupBy($"supp_nation", $"cust_nation", $"ship_year")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"),
        count(lit(1)).as("n_items"))
      .orderBy($"supp_nation", $"cust_nation", $"ship_year")
  }

  val q7NationTradeSql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS ship_year,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS volume,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE sn.n_name <> cn.n_name
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** Dormancy cutoff for [[q22SalesOpportunity]]: a customer with no
    * order on/after this date is considered lapsed. */
  val q22Cutoff = "2000-08-01 00:00:00"

  /** TPC-H Q22 shape — untapped high-value customers: above-average
    * account balance AND no RECENT order (none since [[q22Cutoff]]).
    * Exercises the two decorrelation plays together: the global
    * average is a scalar aggregate broadcast into a row-local filter
    * (never a per-row subquery), and NOT EXISTS is a left-anti join
    * on custkey — BOTH sides pre-filtered before the anti join: only
    * the above-average customer sliver probes, and only the
    * post-cutoff orders sliver builds (the date filter is pushed to
    * the orders scan). Output is the per-nation rollup of count +
    * held balance. */
  def q22SalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val avgBal = Tables.customer(s, dir)
      .filter($"c_acctbal" > 0.0)
      .agg(davg($"c_acctbal").as("ab"))
    Tables.customer(s, dir)
      .crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .join(Tables.orders(s, dir)
          .filter($"o_orderdate" >= lit(q22Cutoff).cast("timestamp"))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("held_balance"))
      .orderBy($"n_name")
  }

  val q22SalesOpportunitySql: String =
    s"""WITH a AS (
       |  SELECT ${davgSql("c_acctbal")} AS ab FROM customer WHERE c_acctbal > 0.0)
       |SELECT n_name, count(*) AS n_cust,
       |  ${dsumSql("c_acctbal")} AS held_balance
       |FROM customer, a
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > a.ab
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '$q22Cutoff')
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue) — the hardest
    * correlated-scalar-aggregate pattern: every lineitem of a
    * brand/size part slice compared against 0.2 × the PER-PART mean
    * quantity, qualifying revenue summed to one "avg yearly" number.
    * The naive plan re-runs the aggregate subquery per outer row;
    * the decorrelated plan computes ALL per-part thresholds in one
    * partial-agged groupBy over the SAME filtered slice and joins
    * them back as a broadcast (part-slice-sized, bounded by the
    * brand/size selectivity) — zero per-row subqueries, zero
    * fact-width shuffles. The slice is materialized once
    * (`localCheckpoint`) so threshold build and detail probe share
    * one scan+broadcast-prune; at cluster scale the slice is the
    * brand's ~1/|brands| sliver of the fact, safely
    * executor-resident. Exact cross-engine: thresholds via [[davg]]
    * (exact decimal mean, bit-identical both engines), revenue via
    * [[dsum]]. */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val partsF = Tables.part(s, dir)
      .filter($"p_brand" === "Brand#23" && $"p_size" < 10)
      .select($"p_partkey")
    val liF = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(partsF), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .localCheckpoint(true)
    val thr = liF.groupBy($"l_partkey")
      .agg((lit(0.2) * davg($"l_quantity")).as("qty_limit"))
      .select($"l_partkey".as("t_partkey"), $"qty_limit")
    liF.join(broadcast(thr), $"l_partkey" === $"t_partkey")
      .filter($"l_quantity" < $"qty_limit")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly_raw"))
      .select(expr(rndSql("avg_yearly_raw", 6)).as("avg_yearly"))
  }

  /** Oracle: the correlated-subquery formulation verbatim. */
  val q17SmallQtyRevenueSql: String =
    s"""SELECT ${rndSql(s"${dsumSql("l_extendedprice")} / CAST(7.0 AS DOUBLE)", 6)} AS avg_yearly
       |FROM lineitem l JOIN part p ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#23' AND p_size < 10
       |  AND l_quantity < (
       |    SELECT CAST(0.2 AS DOUBLE) * ${davgSql("l2.l_quantity")}
       |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  /** Ship-date window for [[q20ExcessSuppliers]]. */
  val q20Lo = "1996-01-01 00:00:00"

  val q20Hi = "1997-01-01 00:00:00"

  /** TPC-H Q20 shape (excess/dominant suppliers) — the two-level
    * nested-IN-with-aggregate-threshold pattern: suppliers who, for
    * some name-filtered part, shipped MORE THAN HALF of that part's
    * total quantity inside a date window (the dominant-supplier
    * variant of Q20's availqty test — this corpus has no partsupp
    * table, so the supply relationship derives from shipments).
    * Decorrelated bottom-up: the name filter broadcast-prunes the
    * fact scan, ONE (part, supplier) partial-agged groupBy is the
    * only fact shuffle, the per-part totals roll up from that
    * already-tiny pair table (never the fact), and the dominance
    * test joins the two bounded aggregates broadcast-side. The
    * supplier dimension is probed last with a broadcast semi-join —
    * the IN chain never materializes a per-row subquery. Dominance
    * compared on the exact 1e-4-quantized integer sums (2·pair >
    * total — no 0.5 double in the predicate). */
  def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val redParts = Tables.part(s, dir)
      .filter($"p_name".startsWith("red "))
      .select($"p_partkey")
    val pairAgg = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit(q20Lo).cast("timestamp") &&
        $"l_shipdate" < lit(q20Hi).cast("timestamp"))
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(quantize($"l_quantity", 4).cast("long").cast(DecimalType(38, 0)))
        .as("pair_q"))
      // materialized once: pair-sized (≤ |filtered parts| × |their
      // suppliers|), consumed by both the per-part rollup and the
      // dominance probe — without this the fact slice is scanned and
      // pair-aggregated twice
      .localCheckpoint(true)
    val partTot = pairAgg.groupBy($"l_partkey")
      .agg(sum($"pair_q").as("tot_q"))
      .select($"l_partkey".as("t_partkey"), $"tot_q")
    val dominant = pairAgg
      .join(broadcast(partTot), $"l_partkey" === $"t_partkey")
      .filter($"pair_q" * lit(2) > $"tot_q")
      .select($"l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(broadcast(dominant), $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name")
      // n_name tiebreaker: the 10× synthetic sweep replicates
      // suppliers sharing an s_name, and s_name alone leaves tied
      // rows in engine-specific order → oracle compare flakes.
      .orderBy($"s_name", $"n_name")
  }

  /** Oracle: the nested-IN + correlated-HAVING formulation. */
  val q20ExcessSuppliersSql: String =
    s"""SELECT s_name, n_name
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
       |    AND l_shipdate >= TIMESTAMP '$q20Lo' AND l_shipdate < TIMESTAMP '$q20Hi'
       |  GROUP BY l_partkey, l_suppkey
       |  HAVING 2 * sum(CAST(floor(l_quantity * 10000 + 0.5) AS DECIMAL(38,0))) > (
       |    SELECT sum(CAST(floor(l2.l_quantity * 10000 + 0.5) AS DECIMAL(38,0)))
       |    FROM lineitem l2
       |    WHERE l2.l_partkey = lineitem.l_partkey
       |      AND l2.l_shipdate >= TIMESTAMP '$q20Lo'
       |      AND l2.l_shipdate < TIMESTAMP '$q20Hi'))
       |ORDER BY s_name, n_name""".stripMargin

  /** Lateness lag for [[q21SoleLateSuppliers]]: a lineitem shipped
    * more than this many days after its order date is late. */
  val q21LateDays = 60

  /** TPC-H Q21 shape (suppliers who kept orders waiting) — the
    * EXISTS + NOT-EXISTS-over-the-same-fact pattern: for finalized
    * orders, count per supplier the late lineitems where (a) the
    * order involves at least one OTHER supplier and (b) NO other
    * supplier was late — the sole-blame attribution. The naive plan
    * is TWO lineitem self-joins (one per quantifier); the engine
    * runs ONE orderkey shuffle instead: orders⋈lineitem co-shuffled
    * on the order key, then a (order, supplier) aggregate and a
    * per-order rollup — both exchange-free, since hash partitioning
    * on orderkey already satisfies their grouping — produce distinct
    * supplier count, late-supplier count and the blamed supplier's
    * late-row count per order; the quantifier pair collapses to
    * `n_supp ≥ 2 AND n_late_supp = 1`. The supplier dim broadcasts
    * at the end onto the order-sized qualifying set. Lateness is
    * exact timestamp arithmetic (shipdate > orderdate + 60 days) on
    * both engines. */
  def q21SoleLateSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordersF = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val perPair = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(ordersF, $"l_orderkey" === $"o_orderkey")
      .withColumn("late",
        when($"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $q21LateDays DAYS"), 1L)
          .otherwise(0L))
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum($"late").as("n_late"))
    val qualifying = perPair.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        countIf($"n_late" > 0).as("n_late_supp"),
        max(when($"n_late" > 0, $"l_suppkey")).as("blame_supp"),
        sum(when($"n_late" > 0, $"n_late").otherwise(0L)).as("late_rows"))
      .filter($"n_supp" >= 2 && $"n_late_supp" === 1)
    qualifying.groupBy($"blame_supp")
      .agg(sum($"late_rows").as("per_supp"))
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"blame_supp" === $"s_suppkey")
      // classic Q21 groups by NAME: suppliers sharing an s_name merge.
      // The per-suppkey aggregate above already fact-reduced, so this
      // regroup runs on the supplier-sized table (caught by the 10×
      // synthetic sweep, where replicated suppliers share names)
      .groupBy($"s_name")
      .agg(sum($"per_supp").as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** Oracle: the double-quantifier formulation verbatim. */
  val q21SoleLateSuppliersSql: String =
    s"""WITH l1 AS (
       |  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
       |  FROM lineitem l JOIN orders o ON o_orderkey = l_orderkey
       |  WHERE o_orderstatus = 'F')
       |SELECT s_name, count(*) AS numwait
       |FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
       |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL $q21LateDays DAY
       |  AND EXISTS (SELECT 1 FROM l1 l2
       |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM l1 l3
       |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
       |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL $q21LateDays DAY)
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name""".stripMargin

  /** Quantity-sum cutoff for [[q18LargeOrders]]. */
  val q18Threshold = 200.0

  /** TPC-H Q18 shape (large-volume orders) — IN over an aggregate
    * HAVING on the SAME fact: the classic plan runs the subquery as a
    * separate scan and semi-joins; here the IN + HAVING + the
    * outer SUM collapse into ONE lineitem aggregate (the qualifying
    * filter needs the same per-order sum the output displays, so a
    * second pass would be pure waste). The qualifying set (~0.1% of
    * orders at the cutoff) broadcasts into the orders scan and the
    * joined result broadcasts into customer — after the one fact
    * shuffle everything is dimension-sized. Top-100 by
    * (totalprice, date, orderkey) plans as TakeOrderedAndProject —
    * never a global sort. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > q18Threshold)
    val withOrders = Tables.orders(s, dir)
      .join(broadcast(bigOrders), $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice", $"sum_qty")
    Tables.customer(s, dir)
      .join(broadcast(withOrders), $"c_custkey" === $"o_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  /** Oracle: the classic nested IN + HAVING formulation verbatim. */
  val q18LargeOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM customer, orders, lineitem
       |WHERE o_orderkey IN (
       |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       |    HAVING ${dsumSql("l_quantity")} > $q18Threshold)
       |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
       |LIMIT 100""".stripMargin

  /** Focus parameters for [[q8MarketShare]]. */
  val q8Region = "ASIA"

  val q8Nation = "NATION_7"

  val q8PartType = "PROMO"

  /** TPC-H Q8 shape (national market share) — the conditional-share
    * two-level aggregate over a multi-fact join chain: of all [[
    * q8PartType]]-part revenue sold to [[q8Region]] customers, the
    * fraction supplied by [[q8Nation]], per order year. Every
    * dimension (part slice, supplier→nation, customer-side
    * nation⋈region) broadcasts; the only shuffles are the two
    * inherent fact-fact joins (lineitem⋈orders on the order key,
    * then ⋈customer on the customer key) and the |years|-sized
    * rollup. The share is a row-local CASE inside ONE aggregate —
    * never two joined subqueries — on exact quantized revenue. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaCust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter($"r_name" === q8Region)),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val suppNation = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation")))
    val vol = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter($"p_type" === q8PartType)
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(suppNation, $"l_suppkey" === $"s_suppkey")
      .withColumn("vol_q",
        quantize($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).cast("long"))
      .select($"l_orderkey", $"supp_nation", $"vol_q")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(asiaCust, $"o_custkey" === $"c_custkey")
    vol.groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        (sum(when($"supp_nation" === q8Nation, $"vol_q").otherwise(0L))
          .cast("double") / lit(10000.0)).as("nation_volume"),
        (sum($"vol_q").cast("double") / lit(10000.0)).as("total_volume"))
      .withColumn("mkt_share",
        expr(Agg0.rndSql("nation_volume / total_volume", 6)))
      .select($"o_year", $"nation_volume", $"total_volume", $"mkt_share")
      .orderBy($"o_year")
  }

  val q8MarketShareSql: String =
    s"""WITH vol AS (
       |  SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
       |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vol_q
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey AND p_type = '$q8PartType'
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '$q8Region')
       |SELECT o_year,
       |  CAST(sum(CASE WHEN supp_nation = '$q8Nation' THEN vol_q ELSE 0 END) AS DOUBLE) / 10000.0 AS nation_volume,
       |  CAST(sum(vol_q) AS DOUBLE) / 10000.0 AS total_volume,
       |  ${Agg0.rndSql(
         "(CAST(sum(CASE WHEN supp_nation = '" + q8Nation + "' THEN vol_q ELSE 0 END) AS DOUBLE) / 10000.0) / " +
           "(CAST(sum(vol_q) AS DOUBLE) / 10000.0)", 6)} AS mkt_share
       |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Cost fraction of retail price standing in for supply cost in
    * [[q9ProductProfit]] (this corpus has no partsupp table). */
  val q9CostFactor = 0.6

  /** TPC-H Q9 shape (product-type profit by nation and year) — the
    * widest join tree in the curriculum: lineitem joined to part
    * (name-filtered: the 'blue' slice), supplier, nation and orders at once, profit =
    * disc. revenue − cost (cost proxied at [[q9CostFactor]] × retail
    * price × quantity — no partsupp here), rolled up per (supplier
    * nation, order year). All three dims broadcast behind the
    * name-filter prune; the ONE fact-fact shuffle is
    * lineitem⋈orders on the order key; profit quantizes exactly at
    * 1e-4 per row, so the rollup is the commutative integer sum. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val greenParts = broadcast(Tables.part(s, dir)
      .filter($"p_name".startsWith("blue "))
      .select($"p_partkey", $"p_retailprice"))
    val suppNation = broadcast(Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation")))
    Tables.lineitem(s, dir)
      .join(greenParts, $"l_partkey" === $"p_partkey")
      .join(suppNation, $"l_suppkey" === $"s_suppkey")
      .withColumn("profit_q",
        quantize($"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(q9CostFactor) * $"p_retailprice" * $"l_quantity", 4).cast("long"))
      .select($"l_orderkey", $"nation", $"profit_q")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"nation", year($"o_orderdate").as("o_year"))
      .agg((sum($"profit_q").cast("double") / lit(10000.0)).as("profit"),
        count(lit(1)).as("n_items"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9ProductProfitSql: String =
    s"""SELECT sn.n_name AS nation, year(o_orderdate) AS o_year,
       |  CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)
       |      - $q9CostFactor * p_retailprice * l_quantity) * 10000.0
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / 10000.0 AS profit,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'blue %'
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q16 shape (supplier diversity per part segment, with an
    * exclusion list) — NOT IN as a broadcast ANTI join + the exact
    * distinct count: per (brand, size bracket), how many DISTINCT
    * suppliers ship those parts, excluding blacklisted suppliers
    * (negative account balance stands in for Q16's complaint
    * filter). The NOT IN side is dimension-sized and broadcasts as a
    * left-anti build; the distinct count is dedup-then-count (one
    * DISTINCT (brand, bracket, supplier) pass with map-side
    * partials, then the counting aggregate) — never a
    * count(DISTINCT) buffer per group. */
  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val excluded = Tables.supplier(s, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter($"p_brand" =!= "Brand#45")
          .select($"p_partkey", $"p_brand", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
      .select($"p_brand", expr("p_size div 10").as("size_bracket"), $"l_suppkey")
      .distinct()
      .groupBy($"p_brand", $"size_bracket")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"size_bracket")
  }

  val q16SupplierCountsSql: String =
    s"""SELECT p_brand, p_size // 10 AS size_bracket,
       |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#45'
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
       |GROUP BY 1, 2
       |ORDER BY supplier_cnt DESC, p_brand, size_bracket""".stripMargin

  /** TPC-H Q6 shape — forecast revenue change: one tight scan with
    * EVERY predicate pushed to parquet (date range, discount band,
    * quantity cap — PlanSpec-grade pushdown showcase) and a single
    * exact-decimal scalar aggregate. The simplest query in the book
    * and the purest test that the scan reads only what it must. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24.0)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q6ForecastRevenueSql: String =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24.0""".stripMargin

  /** TPC-H Q15 shape — the top revenue supplier(s) for one quarter,
    * TIES INCLUDED (the point of Q15's view+max formulation: a
    * row_number()-limit-1 silently drops co-leaders). Per-supplier
    * revenue partial-aggregates from the filtered fact scan; the max
    * is a broadcast scalar; the equality filter returns every
    * supplier at the max. Quantized-long revenue so the equality is
    * exact — a double max-equality can drop the leader itself. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(quantize($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
        .cast("long")).as("rev_q"))
    val top = rev.agg(max($"rev_q").as("max_q"))
    rev.crossJoin(broadcast(top))
      .filter($"rev_q" === $"max_q")
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        ($"rev_q".cast("double") / lit(10000.0)).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_q
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, CAST(rev_q AS DOUBLE) / 10000.0 AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_q = (SELECT max(rev_q) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q19 shape — discounted revenue under OR-of-brackets
    * (brand × size-range × quantity-range disjunction): the predicate
    * that defeats naive pushdown — only the part-side conjuncts
    * prune the dimension scan, the mixed OR evaluates post-join —
    * and the join stays a broadcast with the residual disjunction
    * codegen'd, never a nested loop. */
  def q19BracketRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_size")
    Tables.lineitem(s, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
          $"l_quantity" >= 1.0 && $"l_quantity" <= 11.0) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) &&
          $"l_quantity" >= 10.0 && $"l_quantity" <= 20.0) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) &&
          $"l_quantity" >= 20.0 && $"l_quantity" <= 30.0))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19BracketRevenueSql: String =
    s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1.0 AND 11.0)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       |       AND l_quantity BETWEEN 10.0 AND 20.0)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  /** TPC-H Q2 shape (min-cost supplier) — the correlated-scalar-MIN
    * subquery pattern: for each size/type-filtered part, every
    * EUROPE supplier whose unit cost equals that part's minimum.
    * This corpus has no partsupp (reference schema.ts:1-72 models
    * batches, not supply), so unit cost derives from shipments:
    * min(l_extendedprice / l_quantity) per (part, supplier).
    * Decorrelated bottom-up: region suppliers resolve dim-side and
    * broadcast-SEMI-prune the fact BEFORE the pair aggregate, ONE
    * (part, supplier) groupBy is the only fact shuffle, the per-part
    * MIN rolls up from the already-tiny pair table, and the
    * correlated equality re-joins pair↔min broadcast-side. Costs are
    * compared as 1e-4-quantized integers — an IEEE double division
    * is bit-identical on both engines, but the MIN-equality test
    * must not depend on double formatting. Ties (several suppliers
    * at the min) are all returned, exactly like classic Q2. */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = Tables.part(s, dir)
      .filter($"p_type" === "STANDARD" && $"p_size".between(20, 24))
      .select($"p_partkey", $"p_brand", $"p_size")
    val eurSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val pairCost = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
      .join(broadcast(parts.select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(broadcast(eurSupp.select($"s_suppkey")), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(quantize($"l_extendedprice" / $"l_quantity", 4).cast("long")).as("unit_cost_q"))
      // materialized once: pair-sized (≤ |filtered parts| × |their
      // EUROPE suppliers|), consumed by both the per-part MIN rollup
      // and the correlated-equality probe — without this the fact is
      // scanned and pair-aggregated twice (same device as Q20)
      .localCheckpoint(true)
    val minCost = pairCost.groupBy($"l_partkey")
      .agg(min($"unit_cost_q").as("min_cost_q"))
      .select($"l_partkey".as("m_partkey"), $"min_cost_q")
    pairCost
      .join(broadcast(minCost),
        $"l_partkey" === $"m_partkey" && $"unit_cost_q" === $"min_cost_q")
      .join(broadcast(eurSupp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
        ($"unit_cost_q".cast("double") / lit(10000.0)).as("unit_cost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH eur_supp AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), parts AS (
      |  SELECT p_partkey, p_brand, p_size FROM part
      |  WHERE p_type = 'STANDARD' AND p_size BETWEEN 20 AND 24
      |), pair_cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5) AS BIGINT)) AS unit_cost_q
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM parts)
      |    AND l_suppkey IN (SELECT s_suppkey FROM eur_supp)
      |  GROUP BY l_partkey, l_suppkey
      |), min_cost AS (
      |  SELECT l_partkey AS m_partkey, min(unit_cost_q) AS min_cost_q
      |  FROM pair_cost GROUP BY l_partkey
      |)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |  CAST(unit_cost_q AS DOUBLE) / 10000.0 AS unit_cost
      |FROM pair_cost
      |JOIN min_cost ON l_partkey = m_partkey AND unit_cost_q = min_cost_q
      |JOIN eur_supp ON l_suppkey = s_suppkey
      |JOIN parts ON l_partkey = p_partkey
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q11 shape (important stock) — the HAVING-against-a-global-
    * scalar pattern: per-part shipped value restricted to one
    * nation's suppliers, keeping parts above TWICE the mean per-part
    * value (supply value derives from shipments — no partsupp here).
    * The threshold is SCALE-FREE where classic Q11's fixed fraction
    * is not: TPC-H divides its 0.0001 by SF for exactly this reason —
    * a fixed share-of-total degenerates to zero rows as the part
    * count grows (caught by the 10× sweep: 363 rows at sf0.01 but 0
    * at sf≈1 under a fixed 0.1% cut; the 2×-mean cut stays populated
    * at every scale — 127 rows at sf0.01, 12,280 at sf≈1).
    * The nation's suppliers resolve dim-side and broadcast-SEMI-prune
    * the fact; ONE per-part aggregate is the only fact shuffle; the
    * global (total, count) rolls up from the per-part table (never a
    * second fact scan) and rides a 1-row broadcast crossJoin into the
    * HAVING, which compares exact integers (n_parts·part > 2·total —
    * no double in the predicate). */
  def q11ImportantValue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val perPart = Tables.lineitem(s, dir)
      .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(quantize($"l_extendedprice", 4).cast("long").cast(DecimalType(38, 0)))
        .as("value_q"))
      // materialized once: part-sized, consumed by both the global
      // total rollup and the HAVING probe — without this the fact is
      // scanned and part-aggregated twice (same device as Q20)
      .localCheckpoint(true)
    val total = perPart.agg(sum($"value_q").as("total_q"),
      count(lit(1)).cast("long").as("n_parts"))
    perPart.join(broadcast(total))
      .filter($"value_q" * $"n_parts" > $"total_q" * lit(2L))
      .select($"l_partkey".as("p_partkey"),
        ($"value_q".cast("double") / lit(10000.0)).as("value"))
      .orderBy($"value".desc, $"p_partkey")
  }

  val q11ImportantValueSql: String =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS DECIMAL(38,0))) AS value_q
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_name = 'NATION_3')
      |  GROUP BY l_partkey
      |), tot AS (
      |  SELECT sum(value_q) AS total_q, count(*) AS n_parts FROM per_part
      |)
      |SELECT l_partkey AS p_partkey, CAST(value_q AS DOUBLE) / 10000.0 AS value
      |FROM per_part CROSS JOIN tot
      |WHERE value_q * n_parts > total_q * 2
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** TPC-H Q12 shape (shipping-mode priority audit) — the two-fact
    * co-shuffle + conditional-CASE-aggregation pattern: per line
    * status (this corpus's shipmode stand-in), how many late-shipped
    * lines (> 90 days after order date) belong to critical-priority
    * orders vs the rest, over one ship-year. Both inputs are facts,
    * so the ONLY shuffle is the orderkey equi-join (no broadcast —
    * at 100 TB both sides are corpus-sized; AQE picks the hash side);
    * the priority split is a codegen'd CASE inside the partial
    * aggregate, never a second pass. */
  def q12PriorityLateness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select($"l_orderkey", $"l_linestatus", $"l_shipdate")
    li.join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_linestatus")
      .agg(
        countIf($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH")
          .as("high_line_count"),
        countIf($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH")
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val q12PriorityLatenessSql: String =
    s"""SELECT l_linestatus,
       |  ${countIfSql("o_orderpriority IN ('1-URGENT','2-HIGH')")} AS high_line_count,
       |  ${countIfSql("o_orderpriority NOT IN ('1-URGENT','2-HIGH')")} AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
       |GROUP BY l_linestatus
       |ORDER BY l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q11_important_value"  -> (q11ImportantValue _),
    "q12_priority_lateness" -> (q12PriorityLateness _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q15_top_supplier"   -> (q15TopSupplier _),
    "q19_bracket_revenue" -> (q19BracketRevenue _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q20_excess_suppliers"  -> (q20ExcessSuppliers _),
    "q21_waiting_suppliers" -> (q21SoleLateSuppliers _),
    "q18_large_orders"      -> (q18LargeOrders _),
    "q8_market_share"       -> (q8MarketShare _),
    "q9_product_profit"     -> (q9ProductProfit _),
    "q16_supplier_counts"   -> (q16SupplierCounts _),
    "q10_returned_revenue" -> (q10ReturnedRevenue _),
    "q7_nation_trade"    -> (q7NationTrade _),
    "q14_promo_revenue"  -> (q14PromoRevenue _),
    "q4_late_orders"     -> (q4LateOrders _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_orders"      -> (q3TopOrders _),
    "q5_region_volume"   -> (q5RegionVolume _),
    "q_custdist"         -> (qCustdist _),
    "q_big_orders"       -> (qBigOrders _)
  )

  def oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplierSql,
    "q11_important_value"  -> q11ImportantValueSql,
    "q12_priority_lateness" -> q12PriorityLatenessSql,
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q15_top_supplier"   -> q15TopSupplierSql,
    "q19_bracket_revenue" -> q19BracketRevenueSql,
    "q22_sales_opportunity" -> q22SalesOpportunitySql,
    "q17_small_qty_revenue" -> q17SmallQtyRevenueSql,
    "q20_excess_suppliers"  -> q20ExcessSuppliersSql,
    "q21_waiting_suppliers" -> q21SoleLateSuppliersSql,
    "q18_large_orders"      -> q18LargeOrdersSql,
    "q8_market_share"       -> q8MarketShareSql,
    "q9_product_profit"     -> q9ProductProfitSql,
    "q16_supplier_counts"   -> q16SupplierCountsSql,
    "q10_returned_revenue" -> q10ReturnedRevenueSql,
    "q7_nation_trade"    -> q7NationTradeSql,
    "q14_promo_revenue"  -> q14PromoRevenueSql,
    "q4_late_orders"     -> q4LateOrdersSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders"      -> q3Sql,
    "q5_region_volume"   -> q5Sql,
    "q_custdist"         -> qCustdistSql,
    "q_big_orders"       -> qBigOrdersSql
  )
}
