package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.sources.Tables

/** Core relational surface: scans, filters, equi joins, aggregation,
  * rollup, top-k — the mart-layer capabilities the reference declares
  * (reference `README.md:9,38-39`; SURVEY §2.2-2.4, §2.6).
  *
  * Scale notes (100 TB posture):
  *  - facts (`lineitem`, `orders`) are only ever scanned + hash-aggregated
  *    or joined on their keys; dims (`nation`, `region`, `customer`) are
  *    broadcast so no fact-side shuffle is added beyond the group-by;
  *  - all money arithmetic is exact decimal so results are identical
  *    under any partitioning / AQE re-plan;
  *  - every aggregate is partial-aggregatable (sum/count/min/max), so
  *    map-side combine keeps shuffle volume proportional to group count,
  *    not row count.
  */
object Relational {

  /** A1/A5-shape pricing summary over the largest fact table
    * (TPC-H Q1 form). Exercises scan → filter (pushed to parquet) →
    * hash aggregate. */
  val q1 = Query(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue mart by nation (reference `README.md:9,38` "revenue marts"):
    * fact ⋈ fact on orderkey (sort-merge / shuffled hash at scale), then
    * broadcast dims customer ⋈ nation — the canonical star-join shape. */
  val q2 = Query(
    "q2_revenue_by_nation",
    """SELECT n.n_name AS nation,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o.o_orderkey) AS n_orders
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, nation""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    // customer scales with SF — no broadcast hint (AQE decides); nation
    // is a true constant-size dim, so its hint is safe at any scale
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** Top-k customers by order value — orderBy+limit compiles to
    * TakeOrderedAndProject (per-partition heap + driver merge of k rows,
    * no global sort; SURVEY §2.6). Deterministic tie-break on key. */
  val q3 = Query(
    "q3_top_customers",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Rollup mart (reference `README.md:39` "rollups"): revenue by
    * (mktsegment, orderstatus) with subtotal and grand-total rows.
    * NULL grouping slots are coalesced to 'ALL' so row identity is
    * deterministic across engines. */
  val q4 = Query(
    "q4_segment_rollup",
    """SELECT COALESCE(c.c_mktsegment, 'ALL') AS mktsegment,
      |  COALESCE(o.o_orderstatus, 'ALL') AS orderstatus,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY ROLLUP(c.c_mktsegment, o.o_orderstatus)
      |ORDER BY mktsegment, orderstatus""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        col("revenue"), col("n_orders"))
      .orderBy(col("mktsegment"), col("orderstatus"))
  }

  /** Salted skew join (reference org-skew rule,
    * `data_gen/pseudo_code_rules.txt:2-10`): the q3 revenue join run
    * through `Skew.saltedJoin` — fact rows salted, the dim replicated
    * per salt, so a hot customer's orders spread across reducers. The
    * oracle is the PLAIN join: salting must be invisible in results. */
  val q58 = Query(
    "q58_salted_join",
    """SELECT c.c_mktsegment,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(o, c, Seq("c_custkey"),
        "inner", saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Per-group top-N (§2.6's grouped form): top-3 customers by revenue
    * within each market segment. A PARTITIONED window (scale-safe —
    * one shuffle on the segment+rank sort, never a global window). */
  val q71 = Query(
    "q71_top_per_segment",
    """WITH per AS (
      |  SELECT c.c_mktsegment, c.c_custkey,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_mktsegment, c.c_custkey)
      |SELECT c_mktsegment, c_custkey,
      |  CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rk AS BIGINT) AS rank_in_segment
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |    ORDER BY rev DESC, c_custkey) AS rk
      |  FROM per)
      |WHERE rk <= 3""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val per = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("rev").desc, col("c_custkey").asc)
    per.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"),
        col("rev").cast("double").as("revenue"),
        col("rk").cast("long").as("rank_in_segment"))
  }

  /** CUBE mart (§2.4's full grouping-set lattice — q4 covers ROLLUP):
    * all four (segment × status) aggregation levels. */
  val q72 = Query(
    "q72_segment_cube",
    """SELECT COALESCE(c.c_mktsegment, 'ALL') AS mktsegment,
      |  COALESCE(o.o_orderstatus, 'ALL') AS orderstatus,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY CUBE(c.c_mktsegment, o.o_orderstatus)""".stripMargin) {
    (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(sumMoney(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
          col("revenue"), col("n_orders"))
  }

  val all: Seq[Query] = Seq(q1, q2, q3, q4, q58, q71, q72)
}
