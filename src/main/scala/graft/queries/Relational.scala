package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  // ------------------------------------------------------------ q125

  /** Deep multi-join analytical composition (the TPC-H Q5 shape —
    * "local supplier volume"): six relations, a region filter, a date
    * window, and the co-nationality predicate between customer and
    * supplier. What the reference's mart layer would run as a single
    * reporting query; exercises join ordering + dim broadcasts in one
    * plan. Revenue stays exact decimal end to end: the discount is
    * cast to DECIMAL(4,2) (the data's true granularity) BEFORE the
    * multiply, so price·(1−disc) is exact rational arithmetic in both
    * engines — no double product ever enters a sum. */
  val q125 = Query(
    "q125_local_supplier_volume",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val rev = money(col("l_extendedprice")) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
      .groupBy(col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ------------------------------------------------------------ q126

  private val DormantCut = "2000-01-01"

  /** Anti-join + scalar-aggregate composition (the TPC-H Q22 shape —
    * "global sales opportunity"): customers whose balance beats the
    * positive-balance average but who have placed NO order since the
    * dormancy cutoff. The scalar threshold is one broadcast single-row
    * aggregate (exact decimal sum / count, ONE double division); the
    * dormancy predicate is a LEFT ANTI join against the date-filtered
    * order scan — never a correlated per-row subquery, and the filter
    * pushes into the fact scan before the anti join. */
  val q126 = Query(
    "q126_dormant_customers",
    s"""WITH t AS (
       |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_bal
       |  FROM customer WHERE c_acctbal > 0)
       |SELECT c_mktsegment,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
       |    AS total_bal
       |FROM customer c CROSS JOIN t
       |WHERE c_acctbal > t.avg_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |    WHERE o.o_custkey = c.c_custkey
       |    AND CAST(o.o_orderdate AS DATE) >= DATE '$DormantCut')
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val thr = c.filter(col("c_acctbal") > 0)
      .agg((sum(money(col("c_acctbal"))).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >=
            lit(DormantCut).cast("date")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(money(col("c_acctbal"))).cast("double").as("total_bal"))
  }

  // ------------------------------------------------------------ q185

  /** TPC-H Q4 shape — order-priority checking: orders in a one-quarter
    * window having AT LEAST ONE lineitem shipped more than 60 days
    * after the order date (this corpus's "late" — it carries ship
    * dates, not commit/receipt), counted by priority. The canonical
    * correlated-EXISTS form: a LEFT SEMI join with a composite
    * (equi + range) condition, which Spark executes without
    * materializing or duplicating the probe side — no fan-out, no
    * post-join dedup. Completes the explicit join-form inventory
    * (inner/outer/anti/as-of/interval → + semi). */
  val q185 = Query(
    "q185_order_priority_exists",
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >=
          lit("1995-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  // ------------------------------------------------------------ q187

  /** TPC-H Q10 shape — returned-item report: top-20 customers by
    * returned-revenue in one quarter. The canonical "fact⋈fact then
    * decorate" plan: lineitem('R') ⋈ orders(window) shuffles on
    * orderkey, aggregates to one row per customer, and only THEN joins
    * the (broadcast) customer and nation dims — dims never touch the
    * fact-sized stream. Revenue ranks as EXACT decimal (double only at
    * presentation); top-20 through the distributed rank. */
  val q187 = Query(
    "q187_returned_items",
    """WITH r AS (
      |  SELECT o_custkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |  GROUP BY 1),
      |j AS (
      |  SELECT c_custkey, c_name, n_name, rev
      |  FROM r JOIN customer ON c_custkey = o_custkey
      |    JOIN nation ON n_nationkey = c_nationkey),
      |k AS (
      |  SELECT c_custkey, c_name, n_name, rev,
      |    ROW_NUMBER() OVER (ORDER BY rev DESC, c_custkey) AS rnk
      |  FROM j)
      |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
      |  CAST(rev AS DOUBLE) AS revenue, CAST(rnk AS BIGINT) AS rnk
      |FROM k WHERE rnk <= 20""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >=
          lit("1995-04-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1995-07-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val r = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount")))).as("rv"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rv")).as("rev"))
    val j = r
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("rev"))
    Ranking.withGlobalRank(j,
        struct((-col("rev")).as("nr"), col("c_custkey").as("ck")).asc,
        "rnk")
      .filter(col("rnk") <= 20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev").cast("double").as("revenue"), col("rnk"))
  }

  // ------------------------------------------------------------ q188

  /** TPC-H Q19 shape — discounted revenue under an OR-of-ANDs
    * predicate spanning both join sides (brand/size from part,
    * quantity from lineitem). Exercises disjunctive predicate
    * handling: the per-side conjuncts (`p_size >= 1`, quantity
    * bounds' union) still push to the scans, part stays a broadcast
    * dim, and the residual OR evaluates inside codegen after the
    * join — no plan split into a union of three joins. */
  val q188 = Query(
    "q188_disjunctive_revenue",
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(
        sum(money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ------------------------------------------------------------ q189

  /** TPC-H Q7 shape — volume shipping between two trading nations,
    * by ship year and direction. Two ROLES of the same nation dim
    * (supplier's vs customer's) via aliased broadcasts; the
    * nation-pair disjunction prunes both dim sides before they touch
    * the facts; the fact⋈fact orderkey join carries only the
    * surviving keys. */
  val q189 = Query(
    "q189_nation_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS volume
      |FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = broadcast(Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nations),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nations),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount")))).as("rv"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("c_custkey") === col("o_custkey"))
      .join(supp, col("s_suppkey") === col("l_suppkey"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(col("rv")).cast("double").as("volume"))
  }

  // ------------------------------------------------------------ q235

  /** Pareto concentration: the smallest set of top customers covering
    * 80% of revenue, plus the exact revenue share of the top decile —
    * the "how concentrated is the book" readout q3/q11/q208 bracket.
    * The running total is the DISTRIBUTED prefix-sum operator (range
    * shuffle + per-partition sums, no single-partition window), and
    * the 80% cut is integer cross-multiplication (5·prefix < 4·total),
    * so membership is exact — no float threshold anywhere. */
  val q235 = Query(
    "q235_pareto_customers",
    """WITH cr AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT rev,
      |    COALESCE(CAST(SUM(rev) OVER (
      |      ORDER BY rev DESC, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS HUGEINT), 0) AS prefix,
      |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk
      |  FROM cr),
      |t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |  CAST(SUM(rev) AS HUGEINT) AS tot FROM cr),
      |a AS (
      |  SELECT
      |    (SELECT COUNT(*) FROM r CROSS JOIN t
      |     WHERE 5 * prefix < 4 * tot) AS k80,
      |    (SELECT CAST(SUM(rev) AS HUGEINT) FROM r CROSS JOIN t
      |     WHERE rnk <= CAST(floor(n / 10.0) AS BIGINT)) AS top10rev)
      |SELECT CAST(t.n AS BIGINT) AS n_customers,
      |  CAST(a.k80 AS BIGINT) AS customers_for_80pct,
      |  ROUND(CAST(CAST(a.k80 AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(t.n AS VARCHAR) AS DOUBLE), 6)
      |    AS share_of_customers,
      |  ROUND(CAST(CAST(COALESCE(a.top10rev, 0) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(t.tot AS VARCHAR) AS DOUBLE), 6)
      |    AS top_decile_revenue_share
      |FROM a CROSS JOIN t""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val d38 = DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val cr = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg((sum(money(col("o_totalprice")) * 100)).cast("long")
        .as("rev"))
    val ord = struct((col("rev") * -1).as("nr"),
      col("o_custkey").as("ck")).asc
    val withPrefix = Ranking.withRunningTotal(cr, ord, col("rev"),
      "prefix")
    val r = Ranking.withGlobalRank(withPrefix, ord, "rnk")
    val t = cr.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("rev").cast(d38)).as("tot"))
    val rt = r.crossJoin(broadcast(t))
    val k80 = rt.filter(col("prefix").cast(d38) * 5 <
        col("tot") * 4)
      .agg(count(lit(1)).as("k80"))
    val top10 = rt
      .filter(col("rnk") <=
        floor(col("n").cast("double") / 10.0d).cast("long"))
      .agg(coalesce(sum(col("rev").cast(d38)),
        lit(0).cast(d38)).as("top10rev"))
    t.crossJoin(broadcast(k80)).crossJoin(broadcast(top10))
      .select(col("n").cast("long").as("n_customers"),
        col("k80").cast("long").as("customers_for_80pct"),
        round(dd(col("k80")) / dd(col("n")), 6)
          .as("share_of_customers"),
        round(dd(col("top10rev")) / dd(col("tot")), 6)
          .as("top_decile_revenue_share"))
  }

  // ------------------------------------------------------------ q236

  private val GapMaxWeeks = 12L // histogram cap

  /** Inter-purchase gap distribution: days between a customer's
    * consecutive orders, bucketed into (capped) whole weeks — the
    * repeat-purchase cadence behind q126's dormancy cut and q62's
    * retention. The lag runs under a PER-CUSTOMER window on exact
    * dates (total order: date, orderkey), gaps are exact integer day
    * differences, and the one double op is the final share. */
  val q236 = Query(
    "q236_purchase_gaps",
    s"""WITH o AS (
       |  SELECT o_custkey, o_orderdate, o_orderkey FROM orders),
       |g AS (
       |  SELECT date_diff('day', lag(o_orderdate) OVER (
       |    PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey), o_orderdate) AS gap_days
       |  FROM o),
       |b AS (
       |  SELECT LEAST(CAST(floor(gap_days / 7.0) AS BIGINT),
       |    $GapMaxWeeks) AS gap_weeks
       |  FROM g WHERE gap_days IS NOT NULL),
       |c AS (SELECT gap_weeks, COUNT(*) AS n_gaps FROM b GROUP BY 1),
       |t AS (SELECT SUM(n_gaps) AS tot FROM c)
       |SELECT gap_weeks, CAST(n_gaps AS BIGINT) AS n_gaps,
       |  ROUND(CAST(n_gaps AS DOUBLE) / CAST(tot AS DOUBLE), 6)
       |    AS share
       |FROM c CROSS JOIN t""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val g = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .filter(col("gap_days").isNotNull)
    val c = g.select(least(floor(col("gap_days") / 7.0d).cast("long"),
        lit(GapMaxWeeks)).as("gap_weeks"))
      .groupBy(col("gap_weeks")).agg(count(lit(1)).as("n_gaps"))
    val t = c.agg(sum(col("n_gaps")).as("tot"))
    c.crossJoin(broadcast(t))
      .select(col("gap_weeks"), col("n_gaps"),
        round(col("n_gaps").cast("double") / col("tot").cast("double"),
          6).as("share"))
  }

  // ------------------------------------------------------------ q237

  /** ABC inventory classification: parts ranked by revenue, class A
    * = the head covering 80% of revenue, B = the next 15 points, C =
    * the tail — the q235 Pareto cut generalized to the three-way
    * split a supply-chain mart publishes. Same distributed prefix-sum
    * (range shuffle, no single-partition window); class membership is
    * integer cross-multiplication against the exact total (20·prefix
    * vs 16·T / 19·T), so boundaries are engine-exact. */
  val q237 = Query(
    "q237_abc_parts",
    """WITH pr AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT l_partkey, rev,
      |    COALESCE(CAST(SUM(rev) OVER (
      |      ORDER BY rev DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS HUGEINT), 0) AS prefix
      |  FROM pr),
      |t AS (SELECT CAST(SUM(rev) AS HUGEINT) AS tot,
      |  COUNT(*) AS np FROM pr),
      |cls AS (
      |  SELECT CASE WHEN 20 * prefix < 16 * tot THEN 'A'
      |              WHEN 20 * prefix < 19 * tot THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |    rev
      |  FROM r CROSS JOIN t)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  ROUND(CAST(CAST(CAST(SUM(rev) AS HUGEINT) AS VARCHAR)
      |    AS DOUBLE) / 100.0, 6) AS revenue,
      |  ROUND(CAST(CAST(CAST(SUM(rev) AS HUGEINT) AS VARCHAR)
      |    AS DOUBLE)
      |    / CAST(CAST((SELECT tot FROM t) AS VARCHAR) AS DOUBLE), 6)
      |    AS revenue_share
      |FROM cls GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val d38 = DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val pr = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
      .agg(sum(money(col("l_extendedprice")) * 100).cast("long")
        .as("rev"))
    val ord = struct((col("rev") * -1).as("nr"),
      col("l_partkey").as("pk")).asc
    val r = Ranking.withRunningTotal(pr, ord, col("rev"), "prefix")
    val t = pr.agg(sum(col("rev").cast(d38)).as("tot"))
    val cls = r.crossJoin(broadcast(t))
      .select(
        when(col("prefix").cast(d38) * 20 < col("tot") * 16, "A")
          .when(col("prefix").cast(d38) * 20 < col("tot") * 19, "B")
          .otherwise("C").as("abc_class"),
        col("rev"), col("tot"))
    cls.groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev").cast(d38)).as("crev"), max(col("tot")).as("tot"))
      .select(col("abc_class"), col("n_parts"),
        round(dd(col("crev")) / 100.0d, 6).as("revenue"),
        round(dd(col("crev")) / dd(col("tot")), 6).as("revenue_share"))
  }

  // ------------------------------------------------------------ q238

  /** Fulfillment-latency SLA by order priority: days from order to
    * line shipment — exact p50/p90 and the share shipped within 30
    * days. The percentile needs NO sort of the fact table: ship lag
    * lives on a BOUNDED integer day domain (TPC-H caps it at ~122;
    * any real SLA domain is similarly capped), so per-(priority, lag)
    * counts + a window over the tiny grid give exact order
    * statistics — the value-domain-histogram percentile pattern
    * (q162/q222), immune to 100× fact growth. */
  val q238 = Query(
    "q238_shipping_sla",
    """WITH j AS (
      |  SELECT o.o_orderpriority AS priority,
      |    date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |c AS (
      |  SELECT priority, lag_days, COUNT(*) AS cnt
      |  FROM j GROUP BY 1, 2),
      |t AS (SELECT priority, SUM(cnt) AS n FROM c GROUP BY 1),
      |cum AS (
      |  SELECT priority, lag_days, cnt,
      |    SUM(cnt) OVER (PARTITION BY priority ORDER BY lag_days)
      |      AS ccum
      |  FROM c)
      |SELECT cum.priority, CAST(MAX(t.n) AS BIGINT) AS n_lines,
      |  CAST(MIN(CASE WHEN 2 * ccum >= t.n THEN lag_days END)
      |    AS BIGINT) AS p50_days,
      |  CAST(MIN(CASE WHEN 10 * ccum >= 9 * t.n THEN lag_days END)
      |    AS BIGINT) AS p90_days,
      |  ROUND(CAST(SUM(CASE WHEN lag_days <= 30 THEN cnt ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(MAX(t.n) AS DOUBLE), 6) AS pct_within_30d
      |FROM cum JOIN t ON t.priority = cum.priority
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val j = li.join(o, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))
    val c = j.groupBy(col("priority"), col("lag_days"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.groupBy(col("priority")).agg(sum(col("cnt")).as("n"))
    // the window runs over the bounded (priority, lag) grid, not rows
    val cum = c.withColumn("ccum", sum(col("cnt")).over(
      Window.partitionBy(col("priority")).orderBy(col("lag_days"))))
    cum.join(broadcast(t), Seq("priority"))
      .groupBy(col("priority"))
      .agg(max(col("n")).cast("long").as("n_lines"),
        min(when(col("ccum") * 2 >= col("n"), col("lag_days")))
          .cast("long").as("p50_days"),
        min(when(col("ccum") * 10 >= col("n") * 9, col("lag_days")))
          .cast("long").as("p90_days"),
        round(sum(when(col("lag_days") <= 30, col("cnt"))
            .otherwise(0L)).cast("double") /
          max(col("n")).cast("double"), 6).as("pct_within_30d"))
  }

  // ------------------------------------------------------------ q239

  /** Lorenz curve of customer revenue at the ten population deciles —
    * the plottable curve under q208's Gini scalar and q235's single
    * cut: cumulative revenue share of the poorest 10%, 20%, … 100%.
    * Ascending distributed prefix-sum + global rank; each decile
    * picks the row at the EXACT integer cut floor(n·d/10) (integer
    * products, no float boundary), so the ten points are
    * engine-exact; the share is the one pinned division. */
  val q239 = Query(
    "q239_lorenz_points",
    """WITH cr AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT rev,
      |    COALESCE(CAST(SUM(rev) OVER (
      |      ORDER BY rev, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS HUGEINT), 0) AS prefix,
      |    row_number() OVER (ORDER BY rev, o_custkey) AS rnk
      |  FROM cr),
      |t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |  CAST(SUM(rev) AS HUGEINT) AS tot FROM cr),
      |d AS (SELECT UNNEST(range(1, 11)) AS decile)
      |SELECT CAST(d.decile AS BIGINT) AS decile,
      |  CAST(r.rnk AS BIGINT) AS n_cum,
      |  ROUND(CAST(CAST(r.prefix + r.rev AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(t.tot AS VARCHAR) AS DOUBLE), 6) AS rev_share
      |FROM d CROSS JOIN t
      |JOIN r ON r.rnk = (t.n * d.decile) // 10
      |WHERE (t.n * d.decile) // 10 >= 1""".stripMargin) { (s, dir) =>
    import graft.operators.Ranking
    val d38 = DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val cr = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg((sum(money(col("o_totalprice")) * 100)).cast("long")
        .as("rev"))
    val ord = struct(col("rev").as("r"), col("o_custkey").as("ck")).asc
    val r = Ranking.withGlobalRank(
      Ranking.withRunningTotal(cr, ord, col("rev"), "prefix"), ord,
      "rnk")
    val t = cr.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("rev").cast(d38)).as("tot"))
    val d = s.range(1, 11).select(col("id").cast("int").as("decile"))
    d.crossJoin(broadcast(t))
      .withColumn("cut",
        expr("CAST(n AS BIGINT) * decile div 10"))
      .filter(col("cut") >= 1)
      .join(r, col("rnk") === col("cut"))
      .select(col("decile").cast("long").as("decile"),
        col("rnk").cast("long").as("n_cum"),
        round(dd(col("prefix").cast(d38) + col("rev").cast(d38)) /
          dd(col("tot")), 6).as("rev_share"))
  }

  // ------------------------------------------------------------ q241

  /** Repeat-purchase KPI row: share of customers who ordered more
    * than once, mean orders per customer, and the share of revenue
    * carried by repeat customers — the loyalty headline over q236's
    * cadence histogram and q126's dormancy cut. One per-customer
    * rollup (map-side combinable) plus one bounded re-aggregate;
    * every numerator/denominator is an exact integer and each share
    * is one string-parse-pinned division. */
  val q241 = Query(
    "q241_repeat_rate",
    """WITH cr AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1),
      |a AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n_cust,
      |    CAST(SUM(n_orders) AS HUGEINT) AS n_orders,
      |    CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS n_repeat,
      |    CAST(SUM(rev) AS HUGEINT) AS rev,
      |    CAST(SUM(CASE WHEN n_orders > 1 THEN rev ELSE 0 END)
      |      AS HUGEINT) AS rev_repeat
      |  FROM cr)
      |SELECT CAST(n_cust AS BIGINT) AS n_customers,
      |  CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(n_repeat AS BIGINT) AS n_repeat_customers,
      |  ROUND(CAST(CAST(n_repeat AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(n_cust AS VARCHAR) AS DOUBLE), 6)
      |    AS repeat_rate,
      |  ROUND(CAST(CAST(n_orders AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(n_cust AS VARCHAR) AS DOUBLE), 6)
      |    AS orders_per_customer,
      |  ROUND(CAST(CAST(rev_repeat AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(rev AS VARCHAR) AS DOUBLE), 6)
      |    AS repeat_revenue_share
      |FROM a""".stripMargin) { (s, dir) =>
    val d38 = DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val cr = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(money(col("o_totalprice")) * 100)).cast("long").as("rev"))
    val a = cr.agg(count(lit(1)).cast(d38).as("n_cust"),
      sum(col("n_orders").cast(d38)).as("n_orders"),
      sum(when(col("n_orders") > 1, 1L).otherwise(0L).cast(d38))
        .as("n_repeat"),
      sum(col("rev").cast(d38)).as("rev"),
      sum(when(col("n_orders") > 1, col("rev")).otherwise(0L)
        .cast(d38)).as("rev_repeat"))
    a.select(col("n_cust").cast("long").as("n_customers"),
      col("n_orders").cast("long").as("n_orders"),
      col("n_repeat").cast("long").as("n_repeat_customers"),
      round(dd(col("n_repeat")) / dd(col("n_cust")), 6)
        .as("repeat_rate"),
      round(dd(col("n_orders")) / dd(col("n_cust")), 6)
        .as("orders_per_customer"),
      round(dd(col("rev_repeat")) / dd(col("rev")), 6)
        .as("repeat_revenue_share"))
  }

  // ------------------------------------------------------------ q242

  /** Basket profile: the distribution of lines per order (bounded
    * histogram — TPC-H caps at 7; any order schema caps similarly)
    * with per-size distinct-part and revenue profiles — the
    * order-shape mart behind packing and picking economics. The
    * per-order rollup is the only fact-scale pass; the histogram
    * re-aggregate runs on order-count rows, shares are single pinned
    * divisions. */
  val q242 = Query(
    "q242_basket_profile",
    """WITH ob AS (
      |  SELECT l_orderkey, COUNT(*) AS n_lines,
      |    COUNT(DISTINCT l_partkey) AS n_parts,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_ord FROM ob),
      |h AS (
      |  SELECT n_lines, COUNT(*) AS n_orders,
      |    CAST(SUM(n_parts) AS HUGEINT) AS parts,
      |    CAST(SUM(rev) AS HUGEINT) AS rev
      |  FROM ob GROUP BY 1)
      |SELECT CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(n_orders AS BIGINT) AS n_orders,
      |  ROUND(CAST(CAST(n_orders AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(t.n_ord AS VARCHAR) AS DOUBLE), 6)
      |    AS order_share,
      |  ROUND(CAST(CAST(parts AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(n_orders AS HUGEINT) AS VARCHAR) AS DOUBLE),
      |    6) AS avg_distinct_parts,
      |  ROUND(CAST(CAST(rev AS VARCHAR) AS DOUBLE)
      |    / (CAST(CAST(CAST(n_orders AS HUGEINT) AS VARCHAR) AS DOUBLE)
      |      * 100.0), 6) AS avg_order_value
      |FROM h CROSS JOIN t""".stripMargin) { (s, dir) =>
    val d38 = DecimalType(38, 0)
    def dd(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val ob = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_partkey")).as("n_parts"),
        (sum(money(col("l_extendedprice")) * 100)).cast("long")
          .as("rev"))
    val t = ob.agg(count(lit(1)).cast(d38).as("n_ord"))
    val h = ob.groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_parts").cast(d38)).as("parts"),
        sum(col("rev").cast(d38)).as("rev"))
    h.crossJoin(broadcast(t))
      .select(col("n_lines").cast("long").as("n_lines"),
        col("n_orders").cast("long").as("n_orders"),
        round(dd(col("n_orders").cast(d38)) / dd(col("n_ord")), 6)
          .as("order_share"),
        round(dd(col("parts")) / dd(col("n_orders").cast(d38)), 6)
          .as("avg_distinct_parts"),
        round(dd(col("rev")) /
          (dd(col("n_orders").cast(d38)) * lit(100.0d)), 6)
          .as("avg_order_value"))
  }

  // ------------------------------------------------------------ q244

  /** Per-customer revenue for one market segment through the FUSED
    * salted join+aggregate ([[graft.operators.Skew.saltedJoinAgg]],
    * NOTES_r08: AQE's skew split never fires when the join is
    * consumed downstream — measured 2.5× on the org-skew shape — so
    * the salt is the scale path for skewed fact⋈dim→agg chains).
    * The oracle is the PLAIN join-then-aggregate, so the salted
    * rewrite's exactness is hash-checked end to end, not just
    * spec-asserted: join on (key, salt) → partial decimal sum/count
    * on (key, salt) → final merge on key must reproduce the unsalted
    * result bit for bit (decimal sums are order-independent). */
  val q244 = Query(
    "q244_salted_join_agg",
    """SELECT c_custkey AS custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val facts = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"),
      money(col("o_totalprice")).as("price"))
    val dims = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    graft.operators.Skew.saltedJoinAgg(facts, dims, Seq("custkey"),
        col("price"), "revenue", "n_orders")
      .withColumn("revenue", col("revenue").cast("double"))
  }

  val all: Seq[Query] = Seq(q1, q2, q3, q4, q58, q71, q72, q125, q126,
    q185, q187, q188, q189, q235, q236, q237, q238, q239, q241, q242,
    q244)
}
